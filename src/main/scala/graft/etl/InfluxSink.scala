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
                          pointByPoint: Boolean = false)

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
  def toLine(p: InfluxPoint): String = {
    val sb = new StringBuilder(128)
    sb.append(escMeasurement(p.measurement))
    p.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(',').append(escTag(k)).append('=').append(escTag(v))
    }
    val fields =
      p.fields_num.toSeq.sortBy(_._1).map { case (k, v) => s"${escTag(k)}=$v" } ++
      p.fields_str.toSeq.sortBy(_._1).map { case (k, v) => s"""${escTag(k)}="${escFieldStr(v)}"""" }
    sb.append(' ').append(fields.mkString(","))
    sb.append(' ').append(p.time_ms * 1000000L)
    sb.toString
  }

  /** Pluggable transport so tests capture lines without a server. */
  trait LineWriter extends Serializable {
    def writeBatch(lines: Seq[String]): Unit
  }

  final class HttpLineWriter(cfg: Config) extends LineWriter {
    override def writeBatch(lines: Seq[String]): Unit = {
      if (lines.isEmpty) return
      val url = new URL(
        s"${cfg.url}/api/v2/write?org=${cfg.org}&bucket=${cfg.bucket}&precision=ns")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Authorization", s"Token ${cfg.token}")
      conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
      val out: OutputStream = conn.getOutputStream
      try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val code = conn.getResponseCode
      if (code >= 300)
        throw new RuntimeException(s"influx write failed: HTTP $code")
      conn.disconnect()
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
