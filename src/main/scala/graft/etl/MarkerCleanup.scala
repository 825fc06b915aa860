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
  * Ordering constraint (inherent to the InfluxDB v2 delete API, which
  * supports only tag-EQUALITY predicates): a predicate naming the legacy
  * series' tags also matches the marked copies — the marked series
  * carries the same tags PLUS `ha_type`, and extra tags don't unmatch an
  * equality conjunction. So per series the tool must FETCH → DELETE →
  * WRITE, in that order; writing first would let the delete wipe the
  * fresh copies. The fetched lines are held in memory across the
  * delete-write window (statistics series are series × buckets-sized —
  * bucket rows, never raw samples); if a write still fails after the
  * sink's retries, the tool dumps the series' line protocol to stderr so
  * nothing is lost silently.
  *
  * Identification heuristic (documented, operator-auditable): within the
  * `source=HA` tag family, a point is STATISTICS-shaped iff its field set
  * at one timestamp contains `mean` or `sum` — the two fields only
  * [[graft.etl.Transform.statisticsPoints]] writes (mean-typed sensors
  * carry mean/min/max, sum-typed state/sum; states points write `value`
  * plus flattened attributes, and their `state` field is string-typed).
  * A states point whose ATTRIBUTES flattened to a numeric `mean`/`sum`
  * field would false-positive — the dry-run inventory lists every
  * affected series with its field sets so the operator audits before
  * `--apply`.
  */
object MarkerCleanup {

  /** Raw dump of every marker-less HA point carrying a statistics-family
    * field — the per-field row form [[InfluxScan.parseSamples]] parses;
    * the statistics signature (mean/sum present at the timestamp) is
    * re-checked client-side on the grouped points. */
  def legacyFluxQuery(bucket: String): String =
    s"""from(bucket: "$bucket")
       |  |> range(start: 0)
       |  |> filter(fn: (r) => r["source"] == "HA" and not exists r["ha_type"])
       |  |> filter(fn: (r) => contains(value: r["_field"],
       |       set: ["mean", "min", "max", "state", "sum"]))""".stripMargin

  /** A legacy series key: measurement + its (marker-less) tag set. */
  final case class SeriesKey(measurement: String, tags: Map[String, String])

  final case class SeriesReport(key: SeriesKey, nPoints: Long,
                                firstMs: Long, lastMs: Long,
                                fieldSets: Set[Set[String]],
                                predicate: String)

  final case class Report(series: Seq[SeriesReport], rewritten: Long,
                          dryRun: Boolean)

  /** The three bucket-touching operations, injectable for tests. */
  trait Http {
    def query(flux: String): String
    def delete(startIso: String, stopIso: String, predicate: String): Unit
    def write(lines: Seq[String]): Unit
  }

  final class HttpTransport(cfg: InfluxSink.Config) extends Http {
    private val writer = new InfluxSink.HttpLineWriter(cfg)
    override def query(flux: String): String =
      InfluxWatermarkSource.postFlux(cfg, flux)
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
        s""""predicate": "${escJson(predicate)}"}""")
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

  private def escJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def escPredicateValue(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Tag-equality delete predicate for one legacy series. NOTE: it also
    * matches the MARKED rewrite of the same series (extra tags never
    * unmatch an equality conjunction) — see the ordering constraint in
    * the object doc. */
  def deletePredicate(key: SeriesKey): String = {
    val tagTerms = key.tags.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""$k="${escPredicateValue(v)}""""
    }
    (s"""_measurement="${escPredicateValue(key.measurement)}"""" +: tagTerms)
      .mkString(" AND ")
  }

  /** Grouped legacy points: per (series, timestamp) field maps, kept only
    * when statistics-shaped (mean or sum present). */
  def legacyPoints(csv: String)
      : Map[SeriesKey, Seq[(Long, Map[String, Double])]] =
    InfluxScan.parseSamples(csv)
      .groupBy(s => (SeriesKey(s.measurement, s.tags), s.timeMs))
      .view
      .map { case ((key, ms), ss) =>
        (key, ms,
          ss.flatMap(s => s.value.map(v => s.field -> v)).toMap)
      }
      .filter { case (_, _, fields) =>
        fields.contains("mean") || fields.contains("sum")
      }
      .toSeq
      .groupBy(_._1)
      .view.mapValues(_.map { case (_, ms, fields) => (ms, fields) }
        .sortBy(_._1))
      .toMap

  /** The marked rewrite of one series' points — identical measurement,
    * tags, numeric fields and timestamps, plus `ha_type=statistics`. */
  def markedLines(key: SeriesKey,
                  points: Seq[(Long, Map[String, Double])]): Seq[String] =
    points.map { case (ms, fields) =>
      InfluxSink.toLine(InfluxPoint(key.measurement,
        key.tags + ("ha_type" -> "statistics"), fields, Map.empty, ms))
    }

  private def iso(ms: Long): String = Instant.ofEpochMilli(ms).toString

  /** Inventory (always) + per-series fetch → delete → write (unless
    * `dryRun`). Batches writes at `cfg.batchSize`, matching the sink. */
  def run(cfg: InfluxSink.Config, http: Http,
          dryRun: Boolean = true): Report = {
    val bySeries = legacyPoints(http.query(legacyFluxQuery(cfg.bucket)))
    val reports = bySeries.toSeq
      .sortBy { case (k, _) => (k.measurement, k.tags.toSeq.sorted.toString) }
      .map { case (key, pts) =>
        SeriesReport(key, pts.size.toLong, pts.head._1, pts.last._1,
          pts.map(_._2.keySet).toSet, deletePredicate(key))
      }
    var rewritten = 0L
    if (!dryRun) reports.foreach { r =>
      val lines = markedLines(r.key, bySeries(r.key))
      // delete BEFORE write (the predicate would match the marked copies);
      // stop is exclusive, so one ms past the last legacy point
      http.delete(iso(r.firstMs), iso(r.lastMs + 1L), r.predicate)
      try lines.grouped(cfg.batchSize).foreach(http.write)
      catch {
        case e: Throwable =>
          // the legacy rows are already deleted — surface the buffered
          // lines so the operator can replay them before anything is lost
          System.err.println(
            s"marker cleanup: write-back failed for ${r.key} after " +
              s"delete; replay these ${lines.size} lines manually:")
          lines.foreach(System.err.println)
          throw e
      }
      rewritten += lines.size
    }
    Report(reports, rewritten, dryRun)
  }

  /** CLI: `graft.etl.MarkerCleanup [--apply]`; Influx connection from the
    * environment (S4, fail-fast). Default is the DRY-RUN inventory —
    * audit the listed series and field sets, then re-run with --apply. */
  def main(args: Array[String]): Unit = {
    val cfg = InfluxSink.configFromEnv()
    val report = run(cfg, new HttpTransport(cfg),
      dryRun = !args.contains("--apply"))
    val mode = if (report.dryRun) "DRY-RUN" else "APPLIED"
    println(s"marker cleanup [$mode]: ${report.series.size} legacy " +
      s"series, ${report.series.map(_.nPoints).sum} points" +
      (if (report.dryRun) "" else s", ${report.rewritten} rewritten"))
    report.series.foreach { r =>
      println(s"  ${r.key.measurement} ${r.key.tags.toSeq.sorted.mkString(",")} " +
        s"n=${r.nPoints} [${iso(r.firstMs)}, ${iso(r.lastMs)}] " +
        s"fields=${r.fieldSets.map(_.toSeq.sorted.mkString("+")).mkString("|")}")
    }
  }
}
