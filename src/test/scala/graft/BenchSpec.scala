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

  test("fittedLine fits the driver's capture window, keeps the slowest " +
      "entries, and stays valid JSON") {
    // 300 synthetic queries — more than any round has shipped — with
    // medians 0.001..3.00 s: the full map cannot fit, the tail must
    val results = (1 to 300).map(i =>
      (f"q$i%03d_synthetic_name" -> i * 0.01))
    val line = Bench.fittedLine(results, iters = 3, sfDir = "/sf", 1850)
    assert(line.length <= 1850, s"line is ${line.length} chars")
    // structurally valid JSON (the driver json.loads's it)
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
    // headline stats present
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"n_queries\":300"))
    assert(line.contains("\"median_query\":1.505") ||
      line.contains("\"median_query\":1.51"))
    // the slowest query always survives; the fastest is the one cut
    assert(line.contains("\"q300\":3.000"))
    assert(!line.contains("\"q001\":"))
    // omitted count is consistent with the entries actually present
    val omitted = "\"omitted_fastest\":(\\d+)".r
      .findFirstMatchIn(line).get.group(1).toInt
    val kept = "\"q\\d{3}\":".r.findAllIn(line).size
    assert(kept + omitted == 300)
  }

  test("fittedLine with a small result set keeps everything and omits " +
      "nothing") {
    val results = Seq("q01_a" -> 1.5, "q02_b" -> 0.5, "x01_c" -> 2.5)
    val line = Bench.fittedLine(results, iters = 5, sfDir = "/sf", 1850)
    assert(line.contains("\"q01\":1.500") && line.contains("\"q02\":0.500")
      && line.contains("\"x01\":2.500"))
    assert(line.contains("\"omitted_fastest\":0"))
    assert(line.contains("\"value\":4.500"))
  }

  test("fittedLine keeps EXACTLY a slowest-first prefix at any budget — " +
      "a wide slow key can never be displaced by a narrower faster one") {
    // mixed-width short keys: under the old keep-scanning packing, a
    // budget that rejects the wide "wiiiiiiiiiiide" entry would still
    // admit the faster narrow ones behind it, making omitted_fastest
    // a lie. The fix stops at the first non-fit.
    val results = Seq(
      "s1_slowest" -> 9.0, "wiiiiiiiiiiiiiiiiiiiiiide_w" -> 8.0,
      "n1_fast" -> 7.0, "n2_faster" -> 6.0, "n3_fastest" -> 5.0)
    val order = Seq("s1", "wiiiiiiiiiiiiiiiiiiiiiide", "n1", "n2", "n3")
    (120 to 420 by 7).foreach { budget =>
      val line = Bench.fittedLine(results, iters = 3, sfDir = "/sf", budget)
      val kept = order.filter(k => line.contains("\"" + k + "\":"))
      assert(kept == order.take(kept.size),
        s"budget=$budget kept $kept — not a slowest-first prefix")
      val omitted = "\"omitted_fastest\":(\\d+)".r
        .findFirstMatchIn(line).get.group(1).toInt
      assert(omitted == results.size - kept.size)
    }
  }

  test("fittedLine self-diagnosis fields: anchor series, qmin, slow_at " +
      "and unsampled survive in the suffix (capped), short-keyed, " +
      "inside the char budget — and are absent entirely on a healthy run") {
    val results = (1 to 300).map(i => (f"q$i%03d_synthetic_name" -> i * 0.01))
    // 40 anchor samples (cap 36) and 15 suspects (cap 12), slowest first
    val anchors = (1 to 40).map(i => ((i - 1) * 90.0, 1.0 + i * 0.01))
    val qmin = (1 to 15).map(i => (f"q${301 - i}%03d_synthetic_name",
      (301 - i) * 0.005))
    val slowAt = (0 until 14).map(i => (f"q${300 - i}%03d_synthetic_name",
      Seq(10.0 + i, 400.0 + i)))
    val line = Bench.fittedLine(results, iters = 3, sfDir = "/sf", 1850,
      wallSec = 432.1, anchors = anchors, qmin = qmin, slowAt = slowAt,
      unsampled = 7)
    assert(line.length <= 1850, s"line is ${line.length} chars")
    // (offset, seconds) pairs: offsets whole seconds, values 2 dp
    assert(line.contains("\"anchor\":[[0,1.01],[90,1.02],"),
      "anchor series present as [offset,sec] pairs")
    assert("\"anchor\":\\[(\\[[0-9.,]+\\],?)+\\]".r.findFirstMatchIn(line)
      .get.matched.count(_ == '[') == 37, "anchor series capped at 36")
    assert(line.contains("\"qmin\":{\"q300\":1.500,"),
      "qmin present, short keys, slowest first")
    assert("\"qmin\":\\{([^}]*)\\}".r.findFirstMatchIn(line)
      .get.group(1).split(',').length == 12, "qmin capped at 12")
    // slow_at: per-entry sample start offsets, whole seconds, cap 12
    assert(line.contains("\"slow_at\":{\"q300\":[10,400],"),
      "slow_at present, short keys")
    assert("\"slow_at\":\\{([^}]*)\\}".r.findFirstMatchIn(line)
      .get.group(1).count(_ == '[') == 12, "slow_at capped at 12 entries")
    assert(line.contains("\"unsampled\":7"))
    // the diagnostic suffix costs tail entries, never the headline
    assert(line.contains("\"q300\":3.000") && line.contains("\"wall\":432.100"))
    // still structurally valid JSON despite the nested arrays
    assert(line.startsWith("{") && line.endsWith("}"))
    // healthy run: no anchors, no suspects, nothing cut -> fields absent
    val clean = Bench.fittedLine(results, iters = 3, sfDir = "/sf", 1850)
    assert(!clean.contains("\"anchor\"") && !clean.contains("\"qmin\"") &&
      !clean.contains("\"slow_at\"") && !clean.contains("\"unsampled\""))
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
