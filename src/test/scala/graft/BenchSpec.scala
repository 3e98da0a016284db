package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The per-query drift canary's adjudication arithmetic (Bench.parseHistory
  * / anchor / overThreshold). Round-13 post-mortem: same-session elevated
  * draws raised a query's own trailing-median threshold to 15.8 s, letting
  * a 15.07 s stall reading pass as clean (isolated re-run: 6.14 s). The
  * guards under test: degraded-window runs are dropped from the history
  * when a clean run exists, and the anchor is the trailing MIN — so a bad
  * window can never raise its own bar.
  */
class BenchSpec extends AnyFunSuite with Matchers {

  private def line(sf: String, degraded: Boolean, qs: (String, Double)*): String =
    s"""{"ts":0,"sf":"$sf","degraded":$degraded,"queries":{${
      qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""

  test("degraded runs are excluded when any clean run exists") {
    val lines = Seq(
      line("sf0.1", degraded = false, "q_x" -> 6.1),
      line("sf0.1", degraded = true, "q_x" -> 9.5),
      line("sf0.1", degraded = true, "q_x" -> 8.0))
    Bench.parseHistory(lines, "sf0.1") shouldBe Map("q_x" -> Seq(6.1))
  }

  test("all-degraded history is kept rather than discarded (weak anchor beats none)") {
    val lines = Seq(
      line("sf0.1", degraded = true, "q_x" -> 9.5),
      line("sf0.1", degraded = true, "q_x" -> 8.0))
    Bench.parseHistory(lines, "sf0.1") shouldBe Map("q_x" -> Seq(9.5, 8.0))
  }

  test("pre-r14 lines without a degraded field parse as clean") {
    val legacy = """{"ts":0,"sf":"sf0.1","queries":{"q_x":5.0}}"""
    Bench.parseHistory(Seq(legacy), "sf0.1") shouldBe Map("q_x" -> Seq(5.0))
  }

  test("other scale factors and corrupt lines are ignored") {
    val lines = Seq(
      line("sf0.01", degraded = false, "q_x" -> 0.4),
      "not json at all",
      line("sf0.1", degraded = false, "q_x" -> 2.0))
    Bench.parseHistory(lines, "sf0.1") shouldBe Map("q_x" -> Seq(2.0))
  }

  test("anchor is the trailing min: a majority of elevated draws cannot raise it") {
    // the r13 shape: one honest 6.14 s draw among elevated 9.5/7.9/8.0 —
    // the median (8.0) put the threshold at 16 s; the min keeps it 12.28
    Bench.anchor(Seq(9.5, 7.9, 6.14, 8.0)) shouldBe 6.14
    // with the min anchor the r13 escape (15.07 s) is flagged
    Bench.overThreshold(15.07, Bench.anchor(Seq(9.5, 7.9, 6.14, 8.0))) shouldBe true
  }

  test("threshold is relative AND absolute: sub-second jitter never flags") {
    Bench.overThreshold(0.9, 0.3) shouldBe false // 3x but under +1 s
    Bench.overThreshold(1.4, 0.3) shouldBe true // past both
    Bench.overThreshold(11.0, 6.0) shouldBe false // under 2x for multi-second
    Bench.overThreshold(12.1, 6.0) shouldBe true
  }
}
