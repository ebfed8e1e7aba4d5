package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's timing-integrity gate (VERDICT r9 "What's wrong"
  * #2): reported medians come from successful passes only, a query
  * with zero successful passes aborts the run, and the final artifact
  * can never carry a non-positive value (r8 shipped three negative
  * "timings" that poisoned a round of comparisons). */
class BenchSpec extends AnyFunSuite {

  test("reportFor is the median of the pass times") {
    assert(Bench.reportFor("q", Seq(0.3, 0.1, 0.2)) == 0.2)
    assert(Bench.reportFor("q", Seq(5.0)) == 5.0)
  }

  test("reportFor on a flaky query uses ONLY the successful passes " +
      "and stays positive") {
    // failed passes are recorded as negative elapses; they must not
    // enter the median pool nor flip the report's sign
    assert(Bench.reportFor("q", Seq(-9.0, 0.4, 0.6, -0.1, 0.5)) == 0.5)
  }

  test("reportFor aborts the run when every pass failed — no garbage " +
      "number is ever emitted") {
    val e = intercept[IllegalArgumentException] {
      Bench.reportFor("q99_broken", Seq(-1.2, -0.8, -1.1))
    }
    assert(e.getMessage.contains("q99_broken"))
  }

  test("assertPositive rejects zero and negative timings") {
    Bench.assertPositive(Seq("a" -> 0.001, "b" -> 12.0)) // fine
    intercept[IllegalArgumentException] {
      Bench.assertPositive(Seq("a" -> 0.5, "b" -> -0.072))
    }
    intercept[IllegalArgumentException] {
      Bench.assertPositive(Seq("a" -> 0.0))
    }
  }
}
