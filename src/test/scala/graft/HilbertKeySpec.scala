package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.HilbertKey
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class HilbertKeySpec extends AnyFunSuite with Matchers {

  private def key(x: Int, y: Int): Long =
    HilbertKey.compute(ArrayData.toArrayData(Array(x, y))).longValue()

  /** Independent reference: the 4-state FSM formulation (orientation
    * carried as state, coordinates never mutated) — a different algorithm
    * from compute()'s reflect-and-swap descent, same curve. */
  private val digitTab = Array(0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
  private val transTab = Array(1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)
  private def fsmKey(x0: Int, y0: Int): Long = {
    val x = x0.toLong & 0x7FFFFFFFL
    val y = y0.toLong & 0x7FFFFFFFL
    var st = 0
    var d = 0L
    var b = 30
    while (b >= 0) {
      val idx = (((x >> b) & 1L) * 2 + ((y >> b) & 1L)).toInt
      d += digitTab(st * 4 + idx).toLong << (2 * b)
      st = transTab(st * 4 + idx)
      b -= 1
    }
    d
  }

  /** Inverse walk (d2xy with per-level s-reflection) for round-trip and
    * adjacency checks. */
  private def d2xy(d0: Long): (Long, Long) = {
    var t = d0
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << 31)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("compute ≡ the independent FSM reference on random and corner " +
    "coordinates") {
    val rnd = new Random(7L)
    val corners = Seq((0, 0), (1, 0), (0, 1), (Int.MaxValue, Int.MaxValue),
      (Int.MaxValue, 0), (0, Int.MaxValue), (8, 6), (-1, -7))
    val randoms = Seq.fill(500)((rnd.nextInt(), rnd.nextInt()))
    (corners ++ randoms).foreach { case (x, y) =>
      withClue(s"($x, $y): ") { key(x, y) shouldBe fsmKey(x, y) }
    }
  }

  test("bijective: xy2d(d2xy(d)) == d for random curve positions") {
    val rnd = new Random(11L)
    (0 until 500).foreach { _ =>
      val d = rnd.nextLong() & ((1L << 62) - 1) // [0, 4^31)
      val (x, y) = d2xy(d)
      withClue(s"d=$d -> ($x, $y): ") {
        key(x.toInt, y.toInt) shouldBe d
      }
    }
  }

  test("locality: consecutive keys are ADJACENT cells (|Δx|+|Δy| = 1) — " +
    "the property Morton order lacks") {
    val rnd = new Random(13L)
    (0 until 300).foreach { _ =>
      val d = rnd.nextLong() & ((1L << 62) - 2) // leave room for d+1
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) shouldBe 1L
    }
    // Morton fails this at the first boundary already (z=1 → (1,0),
    // z=2 → (0,1): Manhattan distance 2); the Hilbert walk through the
    // first quad block stays connected
    (0L until 15L).foreach { d =>
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) shouldBe 1L
    }
  }

  test("null coordinate nulls the key; wrong dimension count rejects") {
    HilbertKey.compute(ArrayData.toArrayData(
      Array[java.lang.Integer](3, null))) shouldBe null
    intercept[IllegalArgumentException] {
      HilbertKey.compute(ArrayData.toArrayData(Array(1, 2, 3)))
    }
  }
}
