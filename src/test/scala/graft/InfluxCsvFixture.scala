package graft

/** Shared annotated-CSV stub builder for the Influx property specs: one
  * place owns the header and row shape, so a change to the stub stream
  * (say a new tag column) edits one file, not every spec. */
object InfluxCsvFixture {
  /** One raw sample: optional entity tag, epoch-ms time, numeric value or
    * None for a string-typed sample. */
  final case class S(entity: Option[String], ms: Long, v: Option[Double])

  def csvOf(samples: Seq[S]): String = {
    val header =
      """#datatype,string,long,dateTime:RFC3339,dateTime:RFC3339,dateTime:RFC3339,string,string,string,string
        |#group,false,false,true,true,false,false,true,true,true
        |#default,_result,,,,,,,,
        |,result,table,_start,_stop,_time,_value,_field,_measurement,entity_id
        |""".stripMargin
    header + samples.zipWithIndex.map { case (s, i) =>
      val t = java.time.Instant.ofEpochMilli(s.ms).toString
      val v = s.v.map(_.toString).getOrElse(s"str_$i")
      s",_result,$i,2024-01-01T00:00:00Z,2024-01-02T00:00:00Z,$t,$v,value,ha_states,${s.entity.getOrElse("")}"
    }.mkString("", "\n", "\n")
  }
}
