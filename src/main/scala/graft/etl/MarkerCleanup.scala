package graft.etl

import graft.model.InfluxPoint
import graft.sources.{InfluxScan, InfluxWatermarkSource}

import java.io.OutputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.time.Instant

/** One-shot LEGACY-MARKER cleanup — the upgrade tool for buckets written
  * by pre-`ha_type` versions of the statistics pipeline (the caveat
  * documented at [[graft.Backfill.reverseStatisticsPlan]]): statistics
  * points written WITHOUT the `ha_type=statistics` marker tag (a) evade
  * [[graft.sources.InfluxWatermarkSource.oldestStatisticsTimestamp]], so
  * the first post-upgrade statistics backfill re-exports everything into
  * NEW parallel series, and (b) still match the states watermark's
  * `not exists r["ha_type"]` filter, poisoning the states half's
  * reverse-incremental contract. This tool restores both invariants by
  * REWRITING each marker-less statistics series with the marker added.
  *
  * THE CENTRAL CONSTRAINT — equality-only delete predicates. The InfluxDB
  * v2 delete API supports only tag-EQUALITY conjunctions, and a point
  * carrying EXTRA tags still matches (extra tags never unmatch an
  * equality conjunction). A legacy statistics series' tag set
  * {source, domain, entity_id} is a SUBSET of the same sensor's states
  * series' tags and of its post-upgrade marked statistics series — so any
  * delete wide enough to remove the legacy points ALSO removes the
  * sensor's states history and any already-marked points in the window.
  * The tool therefore works per series in three steps:
  *
  *   1. FETCH the full tag FAMILY (everything the delete predicate will
  *      match) inside the legacy window, with TYPE-AWARE parsing (the
  *      annotated CSV's #datatype row distinguishes double and string
  *      `_value` columns — a states point's string `state` field must
  *      replay as a string);
  *   2. DELETE the window under the tag-equality predicate;
  *   3. WRITE everything back: marker-less STATISTICS-shaped points with
  *      `ha_type=statistics` added, every other fetched point — states
  *      points, already-marked points — VERBATIM.
  *
  * The write must come last (it would otherwise be wiped with the rest);
  * the fetched lines are held in memory across the delete-write window
  * and dumped to stderr if a write still fails after the sink's retries,
  * so nothing is lost silently.
  *
  * QUIESCENCE REQUIREMENT (inherent fetch→delete race): any point landing
  * in the window between the fetch and the delete is removed without
  * being replayed. STOP every writer into the bucket before `--apply`;
  * the dry-run inventory prints this requirement.
  *
  * Point classification inside an affected family (operator-auditable,
  * exact for buckets this pipeline or the reference wrote): a point is
  * STATISTICS-shaped iff every field is numeric, the field set is
  * non-empty and ⊆ {mean, min, max, state, sum}, and `value` is absent —
  * states points always carry either the numeric `value` field or the
  * STRING `state` field (Transform's F7 dispatch), so they never match;
  * partial statistics rows (a sum-typed hour with NULL sum writes only
  * {state}; a mean-typed hour with NULL mean writes only {min,max}) DO
  * match and get the marker. Field types outside double/string fail
  * loudly rather than risk a mistyped replay. */
object MarkerCleanup {

  private val StatFields = Set("mean", "min", "max", "state", "sum")

  /** Phase 1 — find AFFECTED series: every marker-less HA point carrying
    * a statistics-family field, as per-field rows. Cheap relative to the
    * bucket: statistics series are series × buckets-sized. */
  def legacyFluxQuery(bucket: String): String =
    s"""from(bucket: "$bucket")
       |  |> range(start: 0)
       |  |> filter(fn: (r) => r["source"] == "HA" and not exists r["ha_type"])
       |  |> filter(fn: (r) => contains(value: r["_field"],
       |       set: ["mean", "min", "max", "state", "sum"]))""".stripMargin

  /** A legacy series key: measurement + its (marker-less) tag set. */
  final case class SeriesKey(measurement: String, tags: Map[String, String])

  /** Phase 2 — fetch the full TAG FAMILY the delete predicate will match
    * (no field or marker condition: states points and already-marked
    * points in the window must be fetched so they can be replayed). */
  def seriesFluxQuery(bucket: String, key: SeriesKey,
                      startMs: Long, endMs: Long): String = {
    val tagTerms = key.tags.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""r["${fluxEsc(k)}"] == "${fluxEsc(v)}""""
    }
    val terms = (s"""r["_measurement"] == "${fluxEsc(key.measurement)}"""" +:
      tagTerms).mkString(" and ")
    s"""from(bucket: "$bucket")
       |  |> range(start: time(v: ${startMs * 1000000L}),
       |           stop: time(v: ${endMs * 1000000L}))
       |  |> filter(fn: (r) => $terms)""".stripMargin
  }

  /** Flux string-literal escaping for values embedded in the family
    * fetch: backslash, quote, AND the dollar sign — Flux interpolates
    * `${...}` inside double-quoted strings, so a tag value containing
    * `${` would otherwise subvert or break the query. */
  private def fluxEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("$", "\\$")

  final case class SeriesReport(key: SeriesKey, nPoints: Long,
                                firstMs: Long, lastMs: Long,
                                fieldSets: Set[Set[String]],
                                predicate: String)

  final case class Report(series: Seq[SeriesReport], marked: Long,
                          replayed: Long, dryRun: Boolean)

  /** The four bucket-touching operations, injectable for tests.
    * `queryAnnotated` MUST return datatype-annotated CSV — the family
    * replay is type-aware and refuses un-annotated responses. */
  trait Http {
    def query(flux: String): String
    def queryAnnotated(flux: String): String
    def delete(startIso: String, stopIso: String, predicate: String): Unit
    def write(lines: Seq[String]): Unit
  }

  final class HttpTransport(cfg: InfluxSink.Config) extends Http {
    private val writer = new InfluxSink.HttpLineWriter(cfg)
    override def query(flux: String): String =
      InfluxWatermarkSource.postFlux(cfg, flux)

    /** The v2 query API's DEFAULT dialect returns CSV WITHOUT annotation
      * rows (a raw `application/vnd.flux` POST cannot ask for them), so
      * the type-aware family fetch posts the JSON body form and requests
      * the `datatype` annotation explicitly — without it every field
      * would silently parse as double and a states point's string field
      * would be dropped from the replay. */
    override def queryAnnotated(flux: String): String = {
      val url = new URL(s"${cfg.url}/api/v2/query?org=${cfg.org}")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Authorization", s"Token ${cfg.token}")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setRequestProperty("Accept", "application/csv")
      val body = (s"""{"query": "${jsonEsc(flux)}", "dialect": """ +
        """{"header": true, "annotations": ["datatype"]}}""")
        .getBytes(StandardCharsets.UTF_8)
      val out: OutputStream = conn.getOutputStream
      try out.write(body) finally out.close()
      val code = conn.getResponseCode
      if (code >= 300) {
        val err = Option(conn.getErrorStream)
          .map(s => try new String(s.readAllBytes(),
            StandardCharsets.UTF_8).take(300) finally s.close())
          .getOrElse("")
        throw new RuntimeException(s"influx query failed: HTTP $code $err")
      }
      val s = conn.getInputStream
      try new String(s.readAllBytes(), StandardCharsets.UTF_8)
      finally s.close()
    }

    override def write(lines: Seq[String]): Unit = writer.writeBatch(lines)
    override def delete(startIso: String, stopIso: String,
                        predicate: String): Unit = {
      val url = new URL(
        s"${cfg.url}/api/v2/delete?org=${cfg.org}&bucket=${cfg.bucket}")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Authorization", s"Token ${cfg.token}")
      conn.setRequestProperty("Content-Type", "application/json")
      val body = (s"""{"start": "$startIso", "stop": "$stopIso", """ +
        s""""predicate": "${escQuoted(predicate)}"}""")
        .getBytes(StandardCharsets.UTF_8)
      val out: OutputStream = conn.getOutputStream
      try out.write(body) finally out.close()
      val code = conn.getResponseCode
      if (code >= 300) {
        val err = Option(conn.getErrorStream)
          .map(s => try new String(s.readAllBytes(),
            StandardCharsets.UTF_8).take(300) finally s.close())
          .getOrElse("")
        throw new RuntimeException(s"influx delete failed: HTTP $code $err")
      }
      Option(conn.getInputStream).foreach(_.close())
    }
  }

  /** Backslash-and-quote escaping, shared by the JSON delete body and the
    * values inside the delete predicate (same grammar for both). */
  private def escQuoted(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Full JSON-string escaping for the Flux program embedded in the
    * query body (multi-line programs carry raw newlines). */
  private def jsonEsc(s: String): String =
    escQuoted(s).replace("\n", "\\n").replace("\r", "\\r")
      .replace("\t", "\\t")

  /** Tag-equality delete predicate for one legacy series. NOTE: it also
    * matches every point carrying these tags PLUS extras — the same
    * sensor's states series and any already-marked statistics points —
    * which is exactly why [[run]] fetches and replays the whole family
    * (see the object doc). */
  def deletePredicate(key: SeriesKey): String = {
    val tagTerms = key.tags.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""$k="${escQuoted(v)}""""
    }
    (s"""_measurement="${escQuoted(key.measurement)}"""" +: tagTerms)
      .mkString(" AND ")
  }

  /** One fetched point: full tag set, typed field maps. */
  final case class FamilyPoint(measurement: String,
                               tags: Map[String, String], timeNs: Long,
                               fieldsNum: Map[String, Double],
                               fieldsStr: Map[String, String])

  /** TYPE-AWARE annotated-CSV parse: the #datatype annotation row gives
    * each table's `_value` column type, so string fields (a states
    * point's `state`) survive as strings. Three hard rules: (1) a table
    * WITHOUT a datatype annotation fails loudly — guessing "double"
    * would silently drop string fields from the replay, so the fetch
    * must go through [[Http.queryAnnotated]]; (2) only double and string
    * field types are accepted — anything else (long/bool from a foreign
    * writer) fails loudly rather than risk a mistyped replay;
    * (3) timestamps keep full NANOSECOND precision — flooring to ms
    * would silently re-time (and collide) sub-ms points from foreign
    * double-typed writers in the same family. Tag classification shares
    * [[InfluxScan.reserved]] so the two CSV readers can never drift. */
  private[graft] def parseTyped(csv: String): Seq[FamilyPoint] = {
    final case class Row(measurement: String, field: String,
                         num: Option[Double], str: Option[String],
                         timeNs: Long, tags: Map[String, String])
    val rows = Seq.newBuilder[Row]
    var datatypes: Array[String] = null
    var header: Array[String] = null
    var valueIsString = false
    var expectHeader = true
    csv.split("\r?\n").foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) { expectHeader = true; datatypes = null }
      else if (line.startsWith("#")) {
        expectHeader = true
        if (line.startsWith("#datatype,"))
          datatypes = InfluxScan.splitCells(line)
      } else if (expectHeader) {
        header = InfluxScan.splitCells(line)
        expectHeader = false
        val vi = header.indexOf("_value")
        require(datatypes != null && vi >= 0 && vi < datatypes.length,
          "marker cleanup: response table carries no #datatype " +
            "annotation for _value — the family fetch must request the " +
            "datatype annotation (Http.queryAnnotated); refusing to " +
            "guess field types")
        val dt = datatypes(vi)
        valueIsString = dt == "string"
        require(dt == "double" || dt == "string",
          s"marker cleanup: unsupported _value datatype '$dt' — only " +
            "double/string fields (this pipeline's own output) replay " +
            "safely")
      } else {
        val cells = InfluxScan.splitCells(line)
        val col = header.zip(cells).toMap
        for {
          t <- col.get("_time")
          inst <- scala.util.Try(Instant.parse(t)).toOption
          v <- col.get("_value")
          f <- col.get("_field")
        } rows += Row(
          measurement = col.getOrElse("_measurement", ""),
          field = f,
          num = if (valueIsString) None else
            scala.util.Try(v.toDouble).toOption,
          str = if (valueIsString) Some(v) else None,
          timeNs = Math.addExact(
            Math.multiplyExact(inst.getEpochSecond, 1000000000L),
            inst.getNano.toLong),
          tags = col.view.filterKeys(k => !InfluxScan.reserved(k))
            .filter(_._2.nonEmpty).toMap)
      }
    }
    rows.result()
      .groupBy(r => (r.measurement, r.tags, r.timeNs))
      .map { case ((m, tags, ns), rs) =>
        FamilyPoint(m, tags, ns,
          rs.flatMap(r => r.num.map(r.field -> _)).toMap,
          rs.flatMap(r => r.str.map(r.field -> _)).toMap)
      }
      .toSeq.sortBy(p => (p.timeNs, p.tags.size))
  }

  /** Statistics-shape test within an affected family (see object doc). */
  private[graft] def statisticsShaped(p: FamilyPoint): Boolean =
    p.fieldsStr.isEmpty && p.fieldsNum.nonEmpty &&
      !p.fieldsNum.contains("value") &&
      p.fieldsNum.keySet.subsetOf(StatFields)

  /** The replay of one fetched family point: marker-less statistics-
    * shaped points gain `ha_type=statistics`; everything else — states
    * points, already-marked points — replays VERBATIM. Returns
    * (line, gotMarker). */
  private[graft] def replayLine(p: FamilyPoint): (String, Boolean) = {
    val mark = !p.tags.contains("ha_type") && statisticsShaped(p)
    val tags = if (mark) p.tags + ("ha_type" -> "statistics") else p.tags
    (InfluxSink.toLineNs(InfluxPoint(p.measurement, tags, p.fieldsNum,
      p.fieldsStr, 0L), p.timeNs), mark)
  }

  /** Grouped phase-1 rows: per legacy series, the statistics-signature
    * timestamps that define the delete window and the inventory. A
    * timestamp qualifies only when EVERY signature-named field parsed
    * numeric — a states point's `state` field is a STRING, so its
    * unparsable row disqualifies the timestamp (statistics points are
    * all-numeric); partial statistics rows ({state} with a NULL sum,
    * {min,max} with a NULL mean) qualify. A numeric states ATTRIBUTE
    * that collides with a signature name can still false-positive a
    * window — harmless by construction (the family replay is verbatim
    * and [[statisticsShaped]] re-checks against the FULL field set, where
    * the states `value` field excludes it), and visible in the dry-run
    * inventory. */
  def legacyInventory(csv: String)
      : Map[SeriesKey, Seq[(Long, Set[String])]] =
    InfluxScan.parseSamples(csv)
      .groupBy(s => (SeriesKey(s.measurement, s.tags), s.timeMs))
      .view
      .map { case ((key, ms), ss) =>
        (key, ms, ss.map(_.field).toSet, ss.forall(_.value.isDefined))
      }
      .filter { case (_, _, fields, allNumeric) =>
        allNumeric && fields.nonEmpty && fields.subsetOf(StatFields)
      }
      .toSeq
      .groupBy(_._1)
      .view.mapValues(_.map { case (_, ms, fields, _) => (ms, fields) }
        .sortBy(_._1))
      .toMap

  private def iso(ms: Long): String = Instant.ofEpochMilli(ms).toString

  /** Inventory (always) + per-series family fetch → delete → full replay
    * (unless `dryRun`). Batches writes at `cfg.batchSize`. */
  def run(cfg: InfluxSink.Config, http: Http,
          dryRun: Boolean = true): Report = {
    val bySeries = legacyInventory(http.query(legacyFluxQuery(cfg.bucket)))
    val reports = bySeries.toSeq
      .sortBy { case (k, _) => (k.measurement, k.tags.toSeq.sorted.toString) }
      .map { case (key, pts) =>
        SeriesReport(key, pts.size.toLong, pts.head._1, pts.last._1,
          pts.map(_._2).toSet, deletePredicate(key))
      }
    var marked = 0L
    var replayed = 0L
    if (!dryRun) reports.foreach { r =>
      val family = parseTyped(http.queryAnnotated(
        seriesFluxQuery(cfg.bucket, r.key, r.firstMs, r.lastMs + 1L)))
      val lines = family.map(replayLine)
      // delete BEFORE write (the predicate would match the replayed
      // copies); stop is exclusive, one ms past the last legacy point
      http.delete(iso(r.firstMs), iso(r.lastMs + 1L), r.predicate)
      try lines.map(_._1).grouped(cfg.batchSize).foreach(http.write)
      catch {
        case e: Throwable =>
          // the family rows are already deleted — surface the buffered
          // lines so the operator can replay them before anything is lost
          System.err.println(
            s"marker cleanup: write-back failed for ${r.key} after " +
              s"delete; replay these ${lines.size} lines manually:")
          lines.foreach(l => System.err.println(l._1))
          throw e
      }
      marked += lines.count(_._2)
      replayed += lines.count(!_._2)
    }
    Report(reports, marked, replayed, dryRun)
  }

  /** CLI: `graft.etl.MarkerCleanup [--apply]`; Influx connection from the
    * environment (S4, fail-fast). Default is the DRY-RUN inventory —
    * audit the listed series and field sets, STOP all writers into the
    * bucket (fetch→delete is not atomic), then re-run with --apply. */
  def main(args: Array[String]): Unit = {
    val cfg = InfluxSink.configFromEnv()
    val report = run(cfg, new HttpTransport(cfg),
      dryRun = !args.contains("--apply"))
    val mode = if (report.dryRun) "DRY-RUN" else "APPLIED"
    println(s"marker cleanup [$mode]: ${report.series.size} legacy " +
      s"series, ${report.series.map(_.nPoints).sum} statistics points" +
      (if (report.dryRun) "" else
        s", ${report.marked} marked + ${report.replayed} family points " +
          "replayed verbatim"))
    report.series.foreach { r =>
      println(s"  ${r.key.measurement} ${r.key.tags.toSeq.sorted.mkString(",")} " +
        s"n=${r.nPoints} [${iso(r.firstMs)}, ${iso(r.lastMs)}] " +
        s"fields=${r.fieldSets.map(_.toSeq.sorted.mkString("+")).mkString("|")}")
    }
    if (report.dryRun)
      println("NOTE: --apply deletes each series' full TAG FAMILY window " +
        "(states points included) and replays it; stop all writers into " +
        "the bucket first — points arriving between fetch and delete " +
        "would be lost.")
  }
}
