package graft

import graft.plans.InfluxTagSets
import org.apache.spark.sql.catalyst.expressions.{Contains, EndsWith, Expression, GetMapValue, Like, Literal, StartsWith}
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Fuzz the LIKE → regex translation that underpins the tag-regex
  * pushdown: whenever the recognizer claims a pattern, the synthesized
  * regex (evaluated with the CLIENT's Java matcher, exactly as the
  * executor re-check and the trusted-group check do) must select the
  * same strings as Spark's own LIKE evaluation. Patterns mix literal
  * regex metacharacters, `%`/`_` wildcards and escaped wildcards — the
  * full claimed surface. The server half (Go RE2) cannot run here; the
  * translation emits only escaped literals + `.*`/`.`/anchors, the
  * documented RE2 ∩ Java-identical subset, so Java agreement is the
  * testable half of the cross-dialect claim. */
class InfluxTagRegexPropSpec extends AnyFunSuite with Matchers {

  // literal alphabet stacked with regex metacharacters — the chars a
  // broken escape would mistranslate — plus escaped wildcards and the
  // control characters that must make the recognizer DECLINE (they
  // cannot ride a Flux /…/ literal)
  private val literalChar: Gen[String] = Gen.oneOf(
    "a", "b", "s", ".", "*", "+", "?", "(", ")", "[", "]", "{", "}",
    "|", "^", "$", "\\%", "\\_", "\\\\", "e", "n", "\n", "\r")

  private val fragment: Gen[String] = Gen.frequency(
    6 -> literalChar,
    2 -> Gen.const("%"),
    2 -> Gen.const("_"))

  private val patternGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, fragment).map(_.mkString))

  // subjects include line terminators: Spark's LIKE is DOTALL and
  // whole-string, so "a\nb" LIKE 'a%b' is TRUE and "door\n" LIKE
  // '%door' is FALSE — the synthesized (?s)/\z forms must agree
  private val subjectChar: Gen[String] = Gen.oneOf(
    "a", "b", "s", "e", "n", ".", "*", "(", ")", "%", "_", "\\", "x",
    "\n", "\r")
  private val subjectGen: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, subjectChar).map(_.mkString))

  private val mapExpr = Literal.create(null, MapType(StringType, StringType))
  private def tag: Expression =
    GetMapValue(mapExpr, Literal(UTF8String.fromString("k"), StringType))
  private def tagKeyOf(e: Expression): Option[String] = e match {
    case GetMapValue(_, Literal(k: UTF8String, StringType)) => Some(k.toString)
    case _ => None
  }
  private def lit(s: String) = Literal(UTF8String.fromString(s), StringType)

  /** Spark's own LIKE verdict for (subject, pattern) — the interpreted
    * Catalyst evaluation, which builds the same matcher codegen does. */
  private def sparkLike(subject: String, pattern: String): Boolean =
    Like(lit(subject), lit(pattern), '\\')
      .eval(null).asInstanceOf[Boolean]

  test("claimed LIKE patterns: the synthesized regex (Java matcher, the " +
    "client re-check) selects exactly the strings Spark's LIKE selects " +
    "(property)") {
    val prop = Prop.forAllNoShrink(patternGen, Gen.listOfN(60, subjectGen)) {
      (pattern: String, subjects: List[String]) =>
        InfluxTagSets.tagRegexOf(
            Like(tag, lit(pattern), '\\'), tagKeyOf) match {
          case None => true // unclaimed patterns stay client-side
          case Some((k, re)) =>
            k == "k" && {
              val p = java.util.regex.Pattern.compile(re)
              subjects.forall(s =>
                p.matcher(s).find() == sparkLike(s, pattern))
            }
        }
    }
    PropCheck.check(prop, minSuccessful = 200, tag = "InfluxTagRegexPropSpec#1")
  }

  test("StartsWith/EndsWith/Contains forms agree with the string ops " +
    "they translate, over metachar-heavy literals (property)") {
    val litGen = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, literalChar).map(_.mkString.replace("\\", "")))
    val prop = Prop.forAllNoShrink(litGen, Gen.listOfN(40, subjectGen)) {
      (l: String, subjects: List[String]) =>
        val claims = Seq(
          InfluxTagSets.tagRegexOf(StartsWith(tag, lit(l)), tagKeyOf),
          InfluxTagSets.tagRegexOf(EndsWith(tag, lit(l)), tagKeyOf),
          InfluxTagSets.tagRegexOf(Contains(tag, lit(l)), tagKeyOf))
        if (l.exists(Character.isISOControl)) {
          // control chars can't ride a Flux /…/ literal — all decline
          claims.forall(_.isEmpty)
        } else {
          val Seq(Some((_, preRe)), Some((_, sufRe)), Some((_, conRe))) =
            claims
          val pp = java.util.regex.Pattern.compile(preRe)
          val sp = java.util.regex.Pattern.compile(sufRe)
          val cp = java.util.regex.Pattern.compile(conRe)
          subjects.forall { s =>
            pp.matcher(s).find() == s.startsWith(l) &&
              sp.matcher(s).find() == s.endsWith(l) &&
              cp.matcher(s).find() == s.contains(l)
          }
        }
    }
    PropCheck.check(prop, minSuccessful = 120, tag = "InfluxTagRegexPropSpec#2")
  }

  test("unclaimable patterns decline: trailing escape and non-standard " +
    "escapes return None instead of a wrong regex") {
    def claim(p: String) =
      InfluxTagSets.tagRegexOf(Like(tag, lit(p), '\\'), tagKeyOf)
    claim("abc\\") shouldBe None    // trailing escape
    claim("a\\bc") shouldBe None    // escape of a non-wildcard
    claim("a\\%b").isDefined shouldBe true
    claim("a\\_b").isDefined shouldBe true
    claim("a\\\\b").isDefined shouldBe true
    // control characters in the pattern literal can't be interpolated
    // into a Flux /…/ literal — the push declines, the LIKE runs
    // client-side (it remains ANSWERABLE, just not pushed)
    claim("a\nb") shouldBe None
    claim("a\rb%") shouldBe None
    claim("\tx") shouldBe None
  }

  test("newline subjects: LIKE wildcards cross line terminators (Spark " +
    "DOTALL) and suffix anchoring is strict end-of-text") {
    def re(p: String): java.util.regex.Pattern =
      java.util.regex.Pattern.compile(
        InfluxTagSets.tagRegexOf(Like(tag, lit(p), '\\'), tagKeyOf).get._2)
    // '%' spans the newline, exactly as Spark's (?s) LIKE does
    re("a%b").matcher("a\nb").find() shouldBe true
    sparkLike("a\nb", "a%b") shouldBe true
    // '_' matches a newline under DOTALL
    re("a_b").matcher("a\nb").find() shouldBe true
    sparkLike("a\nb", "a_b") shouldBe true
    // a trailing newline must NOT satisfy an end-anchored pattern
    // (Java's '$' would accept it; '\z' refuses, matching Spark)
    re("%door").matcher("door\n").find() shouldBe false
    sparkLike("door\n", "%door") shouldBe false
    // the EndsWith string-op form agrees
    val Some((_, sufRe)) =
      InfluxTagSets.tagRegexOf(EndsWith(tag, lit("door")), tagKeyOf)
    java.util.regex.Pattern.compile(sufRe)
      .matcher("door\n").find() shouldBe false
  }
}
