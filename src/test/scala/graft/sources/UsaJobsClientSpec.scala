package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import UsaJobsClient._

/** Connector state machines, mirroring the reference's unit tier:
  * retry (tests/test_unit.py:248-285), circuit breaker (:85-115) and
  * the pagination stop conditions (tests/test_integration.py:244-313).
  * Pure JVM — no SparkSession needed. */
class UsaJobsClientSpec extends AnyFunSuite {

  // ---- retry ----
  test("retry: succeeds after transient failures, no sleep in tests") {
    var calls = 0
    val out = retry(maxAttempts = 3, sleep = _ => ())(() => {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    })
    assert(out == "ok" && calls == 3)
  }

  test("retry: exhausts attempts and rethrows the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      retry(maxAttempts = 3, sleep = _ => ())(() => {
        calls += 1; throw new RuntimeException(s"fail-$calls")
      })
    }
    assert(calls == 3 && e.getMessage == "fail-3")
  }

  test("retry: backoff doubles the delay") {
    val delays = Seq.newBuilder[Long]
    intercept[RuntimeException] {
      retry(maxAttempts = 3, delayMs = 100, sleep = delays += _)(() =>
        throw new RuntimeException("x"))
    }
    assert(delays.result() == Seq(100L, 200L))
  }

  // ---- circuit breaker ----
  test("breaker: CLOSED → OPEN after threshold, OPEN fails fast") {
    var now = 0L
    val b = new CircuitBreaker(failureThreshold = 3,
      recoveryTimeoutMs = 1000, clock = () => now)
    (1 to 3).foreach { _ =>
      intercept[RuntimeException](b.call(() =>
        throw new RuntimeException("boom")))
    }
    assert(b.currentState == Open)
    intercept[CircuitBreakerOpenException](b.call(() => "never runs"))
  }

  test("breaker: OPEN → HALF_OPEN after recovery, success closes") {
    var now = 0L
    val b = new CircuitBreaker(failureThreshold = 1,
      recoveryTimeoutMs = 1000, clock = () => now)
    intercept[RuntimeException](b.call(() =>
      throw new RuntimeException("boom")))
    assert(b.currentState == Open)
    now = 1500
    assert(b.call(() => "recovered") == "recovered")
    assert(b.currentState == Closed)
  }

  // ---- pagination drain ----
  private def page(n: Int, all: Int): String =
    s"""{"count": $n, "all": $all}"""
  private val counts: String => PageCounts = s => {
    val m = "\"count\": (\\d+), \"all\": (\\d+)".r.findFirstMatchIn(s).get
    PageCounts(m.group(1).toLong, m.group(2).toLong)
  }

  test("drain: stops on partial page (500 + 100 = 600 extracted)") {
    val served = Seq(page(500, 600), page(100, 600), page(100, 600))
    val got = drainPages(r => served(r.page - 1), counts, "k",
      resultsPerPage = 500)
    assert(got.pages.size == 2)
  }

  test("drain: stops on empty page") {
    val served = Seq(page(0, 0))
    assert(drainPages(r => served(r.page - 1), counts, "k").pages.isEmpty)
  }

  test("drain: stops when cumulative count reaches CountAll") {
    val served = Seq(page(500, 1000), page(500, 1000), page(500, 1000))
    val got = drainPages(r => served(r.page - 1), counts, "k",
      resultsPerPage = 500)
    assert(got.pages.size == 2)
  }

  test("drain: respects maxPages ceiling") {
    val got = drainPages(_ => page(500, 1000000), counts, "k", maxPages = 3,
      resultsPerPage = 500)
    assert(got.pages.size == 3)
  }

  test("drain: rate limiter paces requests") {
    val sleeps = Seq.newBuilder[Long]
    var now = 0L
    val limiter = new RateLimiter(1500, sleeps += _, () => now)
    val served = Seq(page(500, 1500), page(500, 1500), page(500, 1500))
    drainPages(r => served(r.page - 1), counts, "k", resultsPerPage = 500,
      limiter = Some(limiter))
    // first acquire free; subsequent ones wait the full interval
    assert(sleeps.result().forall(_ <= 1500) && sleeps.result().nonEmpty)
  }

  // ---- F7 error triage (reference: etl/etl.py:649-659) ----

  /** transport failing hard on one page; retry() is exercised with the
    * default 3 attempts, so failures must be persistent per page. */
  test("drain triage: generic error skips the page and continues") {
    val transport: Transport = r =>
      if (r.page == 2) throw new RuntimeException("boom on page 2")
      else page(500, 2000)
    val got = drainPages(transport, counts, "k", maxPages = 4,
      resultsPerPage = 500)
    assert(got.pages.size == 3) // pages 1, 3, 4
    assert(got.errors.size == 1)
    assert(got.errors.head.contains("page 2"))
  }

  test("drain triage: rate-limit error aborts, keeps fetched pages") {
    val transport: Transport = r =>
      if (r.page == 2) throw new RuntimeException("API rate limit exceeded")
      else page(500, 2000)
    val got = drainPages(transport, counts, "k", maxPages = 4,
      resultsPerPage = 500)
    assert(got.pages.size == 1) // page 1 only; drain aborted at page 2
    assert(got.errors.size == 1)
    assert(got.errors.head.toLowerCase.contains("rate limit"))
  }

  // ---- HTTP transport construction (reference: etl/etl.py:182-222) ----
  test("HttpTransport.buildUri: params, encoding, 500-row API cap") {
    val uri = HttpTransport.buildUri(HttpTransport.DefaultBaseUrl,
      PageRequest("data engineering", 3, 9999, Some("Washington, DC")))
    val q = uri.getRawQuery // form-encoded: space → +
    assert(uri.getHost == "data.usajobs.gov")
    assert(q.contains("Keyword=data+engineering"))
    assert(q.contains("ResultsPerPage=500")) // capped at the API limit
    assert(q.contains("Page=3"))
    assert(q.contains("WhoMayApply=All"))
    assert(q.contains("LocationName=Washington%2C+DC"))
  }

  test("HttpTransport: location omitted when absent; auth headers set") {
    val uri = HttpTransport.buildUri(HttpTransport.DefaultBaseUrl,
      PageRequest("k", 1))
    assert(!uri.getQuery.contains("LocationName"))
    val h = HttpTransport.headers("secret-key").toMap
    assert(h("Authorization-Key") == "secret-key")
    assert(h.contains("User-Agent"))
  }
}
