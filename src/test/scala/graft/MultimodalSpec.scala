package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Edge cases the oracle gate can't shape on the fixed fixtures: identical
  * blobs across kinds, resize at/below the max side, and the decode stub's
  * determinism contract. */
class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "kind")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"), col("kind"))

  test("dedupByContent: identical bytes collapse to min doc_id across kinds") {
    val m = media((5L, "same bytes", "image"), (2L, "same bytes", "video"),
      (9L, "other", "image"))
    val out = Multimodal.dedupByContent(m).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_dups")).toMap
    out(2L) shouldBe 2L // 5 and 2 share bytes; canonical is min id
    out(9L) shouldBe 1L
  }

  test("resizeDims: aspect ratio preserved, no upscale at or under maxSide") {
    // image dims come from the stub: width = 64 + n%512 where n = byte length
    val small = media((0L, "x" * 10, "image"))   // 74x69 -> untouched
    val big = media((3L, "y" * 500, "image"))    // 564x314 -> scaled to 256 long side
    val s = Multimodal.resizeDims(small).collect().head
    s.getAs[Int]("out_width") shouldBe s.getAs[Int]("width")
    s.getAs[Int]("out_height") shouldBe s.getAs[Int]("height")
    val b = Multimodal.resizeDims(big).collect().head
    math.max(b.getAs[Int]("out_width"), b.getAs[Int]("out_height")) shouldBe 256
    // ratio within one floor-rounding step
    val r0 = b.getAs[Int]("width").toDouble / b.getAs[Int]("height")
    val r1 = b.getAs[Int]("out_width").toDouble / b.getAs[Int]("out_height")
    math.abs(r0 - r1) should be < 0.02
  }

  test("featureNearDups: identical blobs pair at cosine 1, skewed byte " +
    "distributions stay apart") {
    // ids all even so the sampleMod filter keeps them
    val m = media((0L, "same bytes here", "image"),
      (2L, "same bytes here", "image"), // byte-identical → cosine 1.0
      (4L, "aaaaaaaaaaaaaaaa", "image")) // all bytes in one residue pattern
    val out = Multimodal.featureNearDups(m, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.keySet shouldBe Set((0L, 2L))
    out((0L, 2L)) shouldBe 1.0
  }

  test("featureNearDupsBucketed: finds the planted near-dup pair and agrees " +
    "with the all-pairs baseline on the sf0.001 fixture") {
    // planted pair: byte-identical blobs land in the same sign-sketch bucket
    // and pair at cosine 1 — the LSH path must not lose them
    val m = media((0L, "same bytes here", "image"),
      (2L, "same bytes here", "image"),
      (4L, "aaaaaaaaaaaaaaaa", "image"))
    val bucketed = Multimodal.featureNearDupsBucketed(m, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    bucketed.keySet shouldBe Set((0L, 2L))
    bucketed((0L, 2L)) shouldBe 1.0
    // fixture-scale LSH contract vs the all-pairs baseline: exact
    // PRECISION (every emitted pair is a baseline pair with the identical
    // cosine — the verification arithmetic is shared, only candidate
    // generation differs) and a deterministic recall floor (sign-LSH can
    // drop a pair whose sketch flips a bit in every band; 16 wide 16-bit
    // bands make that rare even for the near-diagonal vectors whose
    // projections are noise, same posture as MinHash-LSH)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mt = Multimodal.asMediaTable(docs)
    val exact = Multimodal.featureNearDups(mt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Multimodal.featureNearDupsBucketed(mt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    lsh.subsetOf(exact) shouldBe true
    lsh.size.toDouble should be >= 0.9 * exact.size
  }

  test("decodeMeta: deterministic, kind-dependent, blob-length-driven") {
    val m = media((1L, "abc", "audio"), (2L, "abc", "audio"))
    val out = Multimodal.decodeMeta(m).collect()
    out.map(_.n_frames).toSet.size shouldBe 1 // same bytes -> same fake decode
    out.head.n_frames shouldBe 300            // 3 bytes * 100 "samples"
    out.map(_.sha256).toSet.size shouldBe 1
  }
}
