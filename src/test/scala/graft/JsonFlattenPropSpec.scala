package graft

import graft.etl.Transform
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for F2/F9: an arbitrary string→string attrs object,
  * rendered as JSON, parses back to exactly the same map (quirk-relevant
  * escapes included), and numericFields/stringFields partition its entries
  * without loss or overlap (modulo the force-float null-drop of Q4). */
class JsonFlattenPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val key: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val value: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.asciiPrintableChar).map(_.mkString),   // arbitrary printable
    Gen.chooseNum(-999.0, 999.0).map(d => f"$d%.2f"),     // numeric-looking
    Gen.oneOf("", " ", "\"quoted\"", "back\\slash", "tab\there"))
  private val attrsGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(key, value)).map(_.take(6))

  private def toJson(m: Map[String, String]): String =
    m.map { case (k, v) =>
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s""""${esc(k)}":"${esc(v)}""""
    }.mkString("{", ",", "}")

  test("parseAttrs round-trips arbitrary maps; field dispatch partitions them") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(25, attrsGen)) { maps: List[Map[String, String]] =>
      val df = maps.zipWithIndex.map { case (m, i) => (i, toJson(m)) }
        .toDF("id", "shared_attrs")
      val parsed = df.select(col("id"),
        Transform.parseAttrs(col("shared_attrs")).as("a"),
        Transform.numericFields(Transform.parseAttrs(col("shared_attrs"))).as("fn"),
        Transform.stringFields(Transform.parseAttrs(col("shared_attrs"))).as("fs"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getAs[Map[String, String]]("a"),
          r.getAs[Map[String, Double]]("fn"), r.getAs[Map[String, String]]("fs"))))
        .toMap
      maps.zipWithIndex.forall { case (m, i) =>
        val (a, fn, fs) = (parsed(i)._1, parsed(i)._2, parsed(i)._3)
        val roundTrip = a == m
        // partition: every key lands in exactly one side (force-float keys
        // with uncastable values may drop — none generated here unless the
        // key collides with the allowlist, which alphaNum keys can)
        val partition = m.keySet.forall { k =>
          val forced = Transform.forceFloatKeys.contains(k)
          val dropped = forced && fn.get(k).isEmpty && fs.get(k).isEmpty
          fn.contains(k) ^ fs.contains(k) || dropped
        }
        roundTrip && partition
      }
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "JsonFlattenPropSpec#1")
  }
}
