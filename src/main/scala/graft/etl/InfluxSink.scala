package graft.etl

import graft.model.InfluxPoint
import org.apache.spark.sql.{DataFrame, Dataset}

import java.io.OutputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** S3: the InfluxDB batch sink, rebuilt as an executor-parallel
  * line-protocol writer (the reference serializes Point objects and POSTs
  * synchronously one 10k batch at a time from a single thread,
  * sqllite2influxdb.py:100-161).
  *
  * Design: `Dataset[InfluxPoint].foreachPartition` — each executor partition
  * builds line-protocol strings locally and POSTs straight to
  * `/api/v2/write`, giving N-way parallel writes with bounded memory
  * (O(batchSize) lines resident, mirroring the reference's O(BATCH_SIZE)
  * pull loop at sqllite2influxdb.py:183-189). Idempotent by Influx point
  * overwrite semantics (same measurement+tagset+time ⇒ upsert), so Spark
  * task retries are safe (SURVEY §2.10-T3).
  *
  * `pointByPoint` reproduces the reference's DEBUG per-point write mode
  * (sqllite2influxdb.py:148-153).
  */
object InfluxSink {

  final case class Config(url: String, org: String, bucket: String,
                          token: String, batchSize: Int = 10000,
                          pointByPoint: Boolean = false,
                          connectTimeoutMs: Int = 10000,
                          readTimeoutMs: Int = 30000,
                          maxRetries: Int = 3)

  /** S4: config from the environment with fail-fast validation, mirroring
    * the reference's .env load + exit(1) on missing values
    * (sqllite2influxdb.py:10-31, quirk Q8). Driver-side errors are fatal;
    * row-level errors stay permissive (NULL propagation). */
  def configFromEnv(env: Map[String, String] = sys.env): Config = {
    def req(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(s"missing required env var $k"))
    val cfg = Config(
      url = req("INFLUXDB_URL"),
      org = req("INFLUXDB_ORG"),
      bucket = req("INFLUXDB_BUCKET"),
      token = req("INFLUXDB_TOKEN"),
      batchSize = env.getOrElse("BATCH_SIZE", "10000").toInt,
      pointByPoint = env.getOrElse("DEBUG_MODE", "false").toBoolean)
    require(cfg.batchSize > 0, s"BATCH_SIZE must be positive: ${cfg.batchSize}")
    require(cfg.url.startsWith("http"), s"INFLUXDB_URL must be http(s): ${cfg.url}")
    cfg
  }

  /** Line-protocol escaping per the InfluxDB v2 reference:
    * measurement: escape ',' and ' '; tag key/value and field key: escape
    * ',', '=', ' '; string field value: escape '"' and '\'. */
  def escMeasurement(s: String): String =
    s.replace(",", "\\,").replace(" ", "\\ ")
  def escTag(s: String): String =
    s.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")
  def escFieldStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** One point → one line. Numeric fields bare, string fields quoted;
    * timestamp in ns (time_ms * 1e6). Tag order is sorted for deterministic
    * output (Influx recommends sorted tags for write performance). */
  def toLine(p: InfluxPoint): String = toLineNs(p, p.time_ms * 1000000L)

  /** [[toLine]] with an EXPLICIT nanosecond timestamp — the marker
    * cleanup replays fetched family points losslessly, including foreign
    * writers' sub-millisecond times that the ms-typed point row cannot
    * carry (p.time_ms is ignored). */
  def toLineNs(p: InfluxPoint, timeNs: Long): String = {
    val sb = new StringBuilder(128)
    sb.append(escMeasurement(p.measurement))
    p.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(',').append(escTag(k)).append('=').append(escTag(v))
    }
    val fields =
      p.fields_num.toSeq.sortBy(_._1).map { case (k, v) => s"${escTag(k)}=$v" } ++
      p.fields_str.toSeq.sortBy(_._1).map { case (k, v) => s"""${escTag(k)}="${escFieldStr(v)}"""" }
    sb.append(' ').append(fields.mkString(","))
    sb.append(' ').append(timeNs)
    sb.toString
  }

  /** Pluggable transport so tests capture lines without a server. */
  trait LineWriter extends Serializable {
    def writeBatch(lines: Seq[String]): Unit
  }

  /** Production-posture HTTP transport: connect/read timeouts, response
    * body always drained (keep-alive connections are reusable), bounded
    * exponential-backoff retry on 5xx/429/IO errors. 4xx (other than 429)
    * is a permanent error — the batch is malformed, retrying can't help. */
  final class HttpLineWriter(cfg: Config) extends LineWriter {
    private def drain(conn: HttpURLConnection): String = {
      val s = if (conn.getResponseCode >= 400) conn.getErrorStream
              else conn.getInputStream
      if (s == null) "" else
        try new String(s.readAllBytes(), StandardCharsets.UTF_8).take(500)
        finally s.close()
    }

    private def post(body: Array[Byte]): Int = {
      val url = new URL(
        s"${cfg.url}/api/v2/write?org=${cfg.org}&bucket=${cfg.bucket}&precision=ns")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      conn.setRequestProperty("Authorization", s"Token ${cfg.token}")
      conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
      val out: OutputStream = conn.getOutputStream
      try out.write(body) finally out.close()
      val code = conn.getResponseCode
      val detail = drain(conn)
      if (code >= 400 && code < 500 && code != 429)
        throw new RuntimeException(s"influx write rejected: HTTP $code $detail")
      code
    }

    override def writeBatch(lines: Seq[String]): Unit = {
      if (lines.isEmpty) return
      val body = lines.mkString("\n").getBytes(StandardCharsets.UTF_8)
      var attempt = 0
      while (true) {
        val failure: Option[String] =
          try { val c = post(body); if (c < 300) return else Some(s"HTTP $c") }
          catch {
            case e: java.io.IOException => Some(e.toString)
          }
        attempt += 1
        if (attempt > cfg.maxRetries)
          throw new RuntimeException(
            s"influx write failed after ${cfg.maxRetries} retries: ${failure.get}")
        Thread.sleep(200L << (attempt - 1)) // 200/400/800ms backoff
      }
    }
  }

  /** Write a point Dataset. Partition-parallel; within a partition, batches
    * of `batchSize` exactly like the reference's fetchmany loop. */
  def write(points: Dataset[InfluxPoint], cfg: Config,
            writerFactory: Config => LineWriter = new HttpLineWriter(_)): Unit = {
    val batch = if (cfg.pointByPoint) 1 else cfg.batchSize
    points.foreachPartition { it: Iterator[InfluxPoint] =>
      val w = writerFactory(cfg)
      it.map(toLine).grouped(batch).foreach(g => w.writeBatch(g))
    }
  }

  /** points DataFrame (Schemas.influxPoint columns) → typed Dataset. */
  def asPoints(df: DataFrame): Dataset[InfluxPoint] = {
    import df.sparkSession.implicits._
    df.select("measurement", "tags", "fields_num", "fields_str", "time_ms")
      .as[InfluxPoint]
  }
}
