package graft

import graft.etl.Transform
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: Transform.isNumericLike ≡ the reference's Python
  * `s.replace('.','',1).isdigit()` (sqllite2influxdb.py:122) over ASCII
  * inputs (the documented Unicode-digit divergence is excluded by the
  * generator). */
class NumericLikePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Python model: remove the FIRST '.', then "all chars are digits and
    * string non-empty". */
  private def pythonModel(s: String): Boolean = {
    val t = s.replaceFirst("\\.", "")
    t.nonEmpty && t.forall(c => c >= '0' && c <= '9')
  }

  // biased toward near-numeric shapes: digits, dots, signs, exponents
  private val numericish: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.numChar, 2 -> Gen.const('.'), 1 -> Gen.const('-'),
      1 -> Gen.oneOf('e', 'E', '+', ' ', 'a')))
  } yield cs.mkString

  test("isNumericLike matches the Python isdigit model (property)") {
    val prop = Prop.forAllNoShrink(Gen.listOfN(60, numericish)) { ss: List[String] =>
      import spark.implicits._
      val got = ss.toDF("s")
        .select(col("s"), Transform.isNumericLike(col("s")).as("n"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      ss.forall(s => got(s) == pythonModel(s))
    }
    PropCheck.check(prop, minSuccessful = 30, tag = "NumericLikePropSpec#1")
  }

  test("explicit reference cases") {
    val cases = Map(
      "0" -> true, "40.34" -> true, ".5" -> true, "5." -> true, "007" -> true,
      "" -> false, "." -> false, "-5.2" -> false, "1e3" -> false,
      "1.2.3" -> false, " 1" -> false, "+1" -> false, "None" -> false)
    import spark.implicits._
    val got = cases.keys.toSeq.toDF("s")
      .select(col("s"), Transform.isNumericLike(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, exp) =>
      assert(got(s) == exp, s"'$s' expected $exp")
      assert(pythonModel(s) == exp, s"model self-check '$s'")
    }
  }
}
