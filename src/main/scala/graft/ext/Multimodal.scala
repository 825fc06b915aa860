package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed partition-wise.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecode]]); everything Spark-side
  * — schema, binary column handling, partition-wise batch processing,
  * metadata extraction — is real and tested. On a real cluster the stub body
  * is replaced by the codec call; nothing else changes.
  *
  * Scale: `mapPartitions` processes one partition's blobs with one
  * decoder instance (amortized init, the reason for partition-wise rather
  * than per-row UDF); binary blobs never shuffle — all derived metadata is
  * computed map-side and only the (small) metadata rows move.
  */
object Multimodal {

  /** Typed metadata row for a decoded media blob. */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
                             sha256: String, width: Int, height: Int,
                             n_frames: Int)

  /** Fixture adapter: re-type documents.text as a binary "media" column —
    * the shape an image/audio table has at ingest. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("blob"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"))

  /** STUB decoder: stands in for e.g. javax.imageio / ffmpeg. Deterministic
    * fake dimensions derived from blob bytes so tests are stable. Replace
    * the body with a real codec in production — the signature (bytes in,
    * dims out) is the real contract. */
  def stubDecode(blob: Array[Byte], kind: String): (Int, Int, Int) = {
    val n = blob.length
    kind match {
      case "image" => (64 + n % 512, 64 + (n / 2) % 512, 1)
      case "audio" => (1, 1, n * 100)            // "samples"
      case _       => (320, 240, 1 + n % 300)    // "frames"
    }
  }

  /** Partition-wise decode → typed metadata Dataset. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    graft.etl.Tables.fanOut(media.select("doc_id", "blob", "kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // one digest instance per partition (the "decoder init" pattern)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, blob, kind) =>
          val (w, h, f) = stubDecode(blob, kind)
          md.reset()
          val sha = md.digest(blob).map("%02x".format(_)).mkString
          MediaMeta(id, kind, blob.length.toLong, sha, w, h, f)
        }
      }
  }

  /** Oracle-able projection: byte length + sha256 are engine-agnostic;
    * decode-derived fields stay in the rows-only query. */
  /** Exact dedup over the BINARY column: group on the blob's md5, carry a
    * canonical keeper — the first pass of any image/audio corpus pipeline.
    * The shuffle moves 32-char hashes, never blobs (at 100 TB the blobs
    * stay put; only fixed-width digests and ids travel). Oracle: the
    * fixture blob is the utf-8 encoding of `text`, and DuckDB's
    * md5(VARCHAR) hashes the same utf-8 bytes. */
  def dedupByContent(media: DataFrame): DataFrame =
    media.groupBy(md5(col("blob")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))

  def mediaStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(encode(col("text"), "utf-8")).cast("bigint").as("n_bytes"),
      sha2(col("text"), 256).as("sha"))

  /** Resize shape: recompute target dims preserving aspect ratio (the
    * arithmetic is real; the pixel work is the stubbed codec). Pure column
    * ops over the decoded metadata — map-side only. */
  def resizeDims(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val meta = decodeMeta(media).toDF()
    val longSide = greatest(col("width"), col("height"))
    val scale = when(longSide > maxSide,
      lit(maxSide).cast("double") / longSide).otherwise(lit(1.0))
    meta.filter(col("kind") === "image")
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * scale).cast("int").as("out_width"),
        floor(col("height") * scale).cast("int").as("out_height"))
  }

  /** Feature-extract shape: one fixed-width feature vector per media blob,
    * computed partition-wise with an amortized "model" instance (the stub
    * derives a deterministic dim-dim signature from the bytes; a real
    * encoder slots into the same mapPartitions body — batch shape, schema
    * and partitioning are the contract). Blobs never shuffle; only the
    * small feature rows move. The stub sums blob bytes per residue class
    * (exact integer arithmetic) and normalizes with ONE terminal double
    * division, so the DuckDB oracle reproduces every value bit-for-bit. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    graft.etl.Tables.fanOut(media.select("doc_id", "blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // stand-in for per-partition model init (cf. decoder in decodeMeta)
        it.map { case (id, blob) =>
          val sums = new Array[Long](dim)
          var i = 0
          while (i < blob.length) {
            sums(i % dim) += (blob(i) & 0xFF)
            i += 1
          }
          (id, sums.map(_ / 255.0).toSeq)
        }
      }.toDF("doc_id", "features")
  }

  /** Perceptual near-dup over the extracted feature vectors — the
    * multimodal analogue of embedding near-dup (same media re-encoded /
    * resized hashes differently, but its features barely move): sampled
    * all-pairs exact cosine as the oracle baseline; at corpus scale the
    * pair generation swaps to [[graft.ext.Dedup.embeddingNearDups]]'s
    * sign-sketch buckets over these same vectors. Norms are computed once
    * per doc before the pair fan-out; blobs never reach the join — only
    * the dim-sized feature rows. */
  def featureNearDups(media: DataFrame, threshold: Double = 0.9999,
                      sampleMod: Int = 2): DataFrame = {
    // sample BEFORE the typed mapPartitions extraction — Catalyst can't
    // push a predicate through DeserializeToObject, so filtering after
    // would run the feature "model" over the whole corpus (twice, via the
    // self-join) and discard half
    val feats = extractFeatures(media.filter(col("doc_id") % sampleMod === 0))
      .select(col("doc_id"), col("features"),
        sqrt(Similarity.ddot(col("features"), col("features"))).as("nrm"))
    val cos = Similarity.ddot(col("a.features"), col("b.features")) /
      (col("a.nrm") * col("b.nrm"))
    feats.as("a").join(feats.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(cos, 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Bucketed perceptual near-dup — the 100 TB form of [[featureNearDups]]:
    * sign-sketch LSH over the SAME extracted feature vectors, banded with
    * the pigeonhole scheme [[graft.ext.Dedup.simhashPairs]] uses for its
    * 64-bit signatures: `planes` sign bits chunked into `bands` equal
    * slices, candidates = pairs sharing ANY (band, bits) key — an
    * equi-join on the band key instead of an all-pairs nested loop, and a
    * pair is lost only if ≥`bands` of its `planes` sign bits flip (a
    * single monolithic bucket loses a pair on ANY flip, which near-zero
    * projections make common for near-identical vectors). Verification
    * cosine is the identical exact double arithmetic as the all-pairs
    * baseline (ddot over the raw double features; the float cast feeds
    * ONLY the bucketing heuristic), so every emitted pair carries the
    * same cosine the baseline would emit — the all-pairs form is this
    * query's declared exact baseline, mirroring the dedup_jaccard /
    * dedup_minhash_lsh pairing. The repartition pins one Exchange so the
    * self-join's second side is a ReusedExchange (sketch + feature
    * extraction run once, not once per side).
    *
    * Band keys must carry enough bits that buckets stay SMALL relative to
    * the corpus: 16 bits per band (the simhashPairs granularity) gives
    * 65 536 keys per band, so expected bucket size — and with it the
    * within-bucket pair count — stays bounded as the corpus grows; 16 such
    * bands (four stacked 64-plane sketches via SignSketch's plane-offset
    * family) keep recall high — near-diagonal vectors whose projections
    * are noise need many independent chances — since a pair is lost only
    * when every one of the 16 wide bands flips a bit. The original 4-bit
    * keys (32 planes
    * / 8 bands) had only 16 buckets per band: every bucket held n/16 of
    * the corpus and the "bucketed" join was still O(n²) — exactly the
    * super-linear signature the two-point scaling gate exists to catch
    * (20× time on 10× data at sf0.1). */
  def featureNearDupsBucketed(media: DataFrame, threshold: Double = 0.9999,
                              sampleMod: Int = 2, bandBits: Int = 16,
                              bands: Int = 16): DataFrame = {
    require(bandBits <= 64 && 64 % bandBits == 0,
      "a band key must fit one long and align to word boundaries")
    val sigs = (0 until (bands * bandBits + 63) / 64).map { w =>
      Similarity.signSketch(col("features").cast("array<float>"),
        math.min(64, bands * bandBits - w * 64), 8, planeOffset = w * 64)
        .as(s"sig_$w")
    }
    val sketched = extractFeatures(media.filter(col("doc_id") % sampleMod === 0))
      .select(Seq(col("doc_id"), col("features"),
        sqrt(Similarity.ddot(col("features"), col("features"))).as("nrm")) ++
        sigs: _*)
    // r21: a salted pin — repartition(band, bkey, pmod(xxhash64(doc_id), 8))
    // with the join keys untouched — was tried against the measured bucket
    // skew (sf0.1: hottest bucket 1372 docs; 1.0M of 6.25M candidate pairs
    // on one of 32 partitions) and MEASURED SLOWER on a quiet host
    // (interleaved min-of-5: 3.24s -> 3.72s, identical 652 rows): per-pair
    // work here is 8 multiply-adds, so the imbalance costs less than the
    // wider exchange + bigger build side the salt adds. Rule: salt a pair
    // join only when per-pair work, not scheduling, is the wall.
    val banded = sketched.select(col("doc_id"), col("features"), col("nrm"),
        posexplode(array((0 until bands).map { b =>
          val bit = b * bandBits
          shiftright(col(s"sig_${bit / 64}"), bit % 64)
            .bitwiseAND(lit((1L << bandBits) - 1))
        }: _*))
          .as(Seq("band", "bkey")))
      .repartition(col("band"), col("bkey"))
    val cos = Similarity.ddot(col("a.features"), col("b.features")) /
      (col("a.nrm") * col("b.nrm"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(cos, 6).as("cosine"))
      // a pair can collide in several bands — dedup AFTER the cheap
      // per-pair cosine (scalar rows), mirroring simhashPairs' distinct.
      // r21 checked whether moving the threshold filter ahead of the
      // distinct would shrink the dedup exchange: the executed plan is
      // BYTE-IDENTICAL either way — the predicate references only the
      // aggregate's grouping columns, so Catalyst's predicate pushdown
      // already evaluates it inside the pair join, before the exchange.
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** Frame-sampling shape: explode a per-video frame index (every `stride`-th
    * frame) — the fan-out pattern a video pipeline uses before per-frame
    * featurization. */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame = {
    val meta = decodeMeta(media).toDF()
    meta.filter(col("kind") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
