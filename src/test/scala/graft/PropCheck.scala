package graft

import org.scalacheck.rng.Seed
import org.scalacheck.{Prop, Test => SCTest}

/** Deterministic ScalaCheck harness shared by every property spec.
  *
  * Two hard rules, adopted after a one-in-N suite flake proved an
  * unseeded property gate can't be trusted:
  *
  *   1. the initial seed is PINNED, derived from a per-call-site tag, so
  *      every run draws the identical case sequence — a red property
  *      reproduces bit-for-bit from the tag alone, in isolation or under
  *      full parallel-suite load, on any machine and in any suite order;
  *   2. the failure message embeds the tag, the seed, and the full
  *      ScalaCheck status (shrunk arguments plus all property labels) —
  *      a red run carries its own counterexample in the assertion text.
  *      Specs attach rich got/want diffs as DYNAMIC labels
  *      (`ok :| s"got=... want=..."` via `Prop.propBoolean`), never as
  *      stderr prints that a CI log drops.
  *
  * Suite convention: properties use `Prop.forAllNoShrink`. The generators
  * here are domain-constrained (quarter-unit values, 5-minute grids,
  * t0-anchored endpoints) and the exact-arithmetic models are only
  * defined ON those domains; ScalaCheck shrinking ignores generator
  * invariants, so a shrunk "counterexample" can be an out-of-domain
  * artifact that masks the real failure (observed: a genuine model bug
  * shrank to a sub-cent value the quarter-integer model cannot
  * represent). With pinned seeds the unshrunk case reproduces verbatim.
  */
object PropCheck {
  /** Stable 64-bit seed from the call-site tag (String.hashCode is part
    * of the JLS spec, so this is identical across JVMs and runs). */
  private def seedOf(tag: String): Seed =
    Seed(tag.hashCode.toLong * 0x9E3779B97F4A7C15L)

  def check(prop: Prop, minSuccessful: Int, tag: String): Unit = {
    val seed = seedOf(tag)
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minSuccessful)
        .withInitialSeed(seed),
      prop)
    assert(res.passed, s"[$tag seed=${seed.long._1}] ${res.status}")
  }
}
