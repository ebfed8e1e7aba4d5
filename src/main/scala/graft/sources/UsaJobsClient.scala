package graft.sources

/** Connector-side machinery for the paginated USAJOBS REST source —
  * retry with exponential backoff (reference: @retry decorator,
  * etl/etl.py:63-93), three-state circuit breaker (etl/etl.py:131-161),
  * fixed-interval rate limiting (etl/etl.py:180,211) and the page drain
  * loop with its three stop conditions (etl/etl.py:617-659).
  *
  * This is driver-side connector code, not a query operator (SURVEY §4.2):
  * pages are fetched on the driver (or, in the DataSource V2 evolution,
  * one page per InputPartition) and handed to Spark as a Dataset of raw
  * JSON documents. The transport is injectable so tests drive the whole
  * state machine without a network.
  */
object UsaJobsClient {

  /** Query parameters for one page (reference: etl/etl.py:182-222). */
  case class PageRequest(keyword: String, page: Int, resultsPerPage: Int = 500,
      location: Option[String] = None)

  /** Transport: given a page request, return the raw JSON payload.
    * Production wraps java.net.http.HttpClient (HttpTransport below);
    * tests inject fixtures. */
  type Transport = PageRequest => String

  // ------------------------------------------------------- HTTP transport

  /** Production transport over java.net.http (reference: search_jobs with
    * requests.Session, etl/etl.py:170-222): auth headers, 30 s timeout,
    * ResultsPerPage capped at the API's 500 limit, non-2xx → IOException
    * (the retry/breaker layers handle it). The Host header of the
    * reference is implied by the URI here (java.net.http restricts
    * explicitly setting it). URI/header construction is split out pure so
    * it is unit-testable without a network. */
  object HttpTransport {
    val DefaultBaseUrl = "https://data.usajobs.gov/api/search"

    def buildUri(baseUrl: String, req: PageRequest): java.net.URI = {
      def enc(s: String) =
        java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      val params = Seq(
        "Keyword" -> req.keyword,
        "ResultsPerPage" -> math.min(req.resultsPerPage, 500).toString,
        "Page" -> req.page.toString,
        "WhoMayApply" -> "All") ++
        req.location.map("LocationName" -> _)
      java.net.URI.create(
        baseUrl + "?" + params
          .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&"))
    }

    def headers(apiKey: String,
        userAgent: String = "graft-etl/1.0"): Seq[(String, String)] =
      Seq("User-Agent" -> userAgent, "Authorization-Key" -> apiKey)

    def apply(apiKey: String, baseUrl: String = DefaultBaseUrl,
        timeoutSec: Long = 30): Transport = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(timeoutSec))
        .build()
      req => {
        val b = java.net.http.HttpRequest.newBuilder(buildUri(baseUrl, req))
          .timeout(java.time.Duration.ofSeconds(timeoutSec))
        headers(apiKey).foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() < 200 || resp.statusCode() >= 300)
          throw new java.io.IOException(
            s"HTTP ${resp.statusCode()} fetching page ${req.page}" +
              (if (resp.statusCode() == 429) " (rate limit)" else ""))
        resp.body()
      }
    }
  }

  // ---------------------------------------------------------------- retry

  /** Retry with exponential backoff (3 attempts, delay doubling — matches
    * the reference's defaults at etl/etl.py:63-93). `sleep` injectable so
    * tests run instantly. */
  def retry[T](maxAttempts: Int = 3, delayMs: Long = 2000,
      backoff: Double = 2.0, sleep: Long => Unit = Thread.sleep)(
      f: () => T): T = {
    var attempt = 0
    var currentDelay = delayMs
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      try return f()
      catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxAttempts) {
            sleep(currentDelay)
            currentDelay = (currentDelay * backoff).toLong
          }
      }
    }
    throw lastErr
  }

  // ------------------------------------------------------- circuit breaker

  sealed trait BreakerState
  case object Closed extends BreakerState
  case object Open extends BreakerState
  case object HalfOpen extends BreakerState

  class CircuitBreakerOpenException(msg: String) extends RuntimeException(msg)

  /** CLOSED → OPEN after `failureThreshold` accumulated failures (the
    * count resets ONLY on a HALF_OPEN success — cumulative over the
    * breaker's lifetime, exactly the reference's semantics,
    * etl/etl.py:148-161); OPEN → HALF_OPEN after `recoveryTimeoutMs`;
    * HALF_OPEN success closes it again. `clock` injectable. */
  class CircuitBreaker(failureThreshold: Int = 5,
      recoveryTimeoutMs: Long = 60000,
      clock: () => Long = () => System.currentTimeMillis()) {
    private var failures = 0
    private var lastFailureAt = 0L
    private var state: BreakerState = Closed

    def currentState: BreakerState = state

    def call[T](f: () => T): T = {
      if (state == Open) {
        if (clock() - lastFailureAt >= recoveryTimeoutMs) state = HalfOpen
        else throw new CircuitBreakerOpenException("Circuit breaker is OPEN")
      }
      try {
        val out = f()
        if (state == HalfOpen) { state = Closed; failures = 0 }
        out
      } catch {
        case e: Throwable =>
          failures += 1
          lastFailureAt = clock()
          if (failures >= failureThreshold) state = Open
          throw e
      }
    }
  }

  // ------------------------------------------------------------ rate limit

  /** Fixed-interval limiter (reference API_DELAY, default 1.5 s). */
  class RateLimiter(intervalMs: Long, sleep: Long => Unit = Thread.sleep,
      clock: () => Long = () => System.currentTimeMillis()) {
    private var lastAt = 0L
    def acquire(): Unit = {
      val wait = lastAt + intervalMs - clock()
      if (wait > 0) sleep(wait)
      lastAt = clock()
    }
  }

  // ------------------------------------------------------------ drain loop

  /** Pagination result counters extracted from a page payload. The drain
    * loop only needs the two counts; full parsing happens in Spark. */
  case class PageCounts(resultCount: Long, resultCountAll: Long)

  /** Drain outcome: payloads in arrival order + per-page error messages
    * collected by the F7 triage (the run continues past them). */
  case class DrainResult(pages: Seq[String], errors: Seq[String])

  /** Drain pages 1..maxPages with the reference's stop conditions
    * (etl/etl.py:617-659): stop on empty page, on partial page
    * (< resultsPerPage) and when the cumulative count reaches
    * SearchResultCountAll.
    *
    * Error triage (F7, etl/etl.py:649-659): when a page still fails after
    * retry/breaker, the error is recorded and the drain CONTINUES with the
    * next page — unless the message mentions "rate limit" (case-
    * insensitive), which aborts the drain and returns what was fetched so
    * far. Either way the pipeline proceeds to the load phase.
    *
    * Nesting is retry(breaker(fetch)) — the reference's order (@retry on
    * search_jobs, breaker inside it, etl/etl.py:182/214): each retry
    * attempt counts against the breaker, replicated deliberately.
    * resultsPerPage is capped at the API's 500 limit HERE as well as in
    * the transport, so the partial-page stop condition always compares
    * against what was actually requested. */
  def drainPages(transport: Transport, counts: String => PageCounts,
      keyword: String, location: Option[String] = None, maxPages: Int = 20,
      resultsPerPage: Int = 500, limiter: Option[RateLimiter] = None,
      breaker: Option[CircuitBreaker] = None): DrainResult = {
    val rpp = math.min(resultsPerPage, 500)
    val pages = Seq.newBuilder[String]
    val errors = Seq.newBuilder[String]
    var fetched = 0L
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      limiter.foreach(_.acquire())
      val fetch = () => transport(
        PageRequest(keyword, page, rpp, location))
      try {
        val payload = breaker match {
          case Some(b) => retry()(() => b.call(fetch))
          case None => retry()(fetch)
        }
        val c = counts(payload)
        if (c.resultCount == 0) done = true
        else {
          pages += payload
          fetched += c.resultCount
          if (c.resultCount < rpp) done = true
          if (c.resultCountAll > 0 && fetched >= c.resultCountAll) done = true
          page += 1
        }
      } catch {
        case e: Throwable =>
          val msg = s"Error processing page $page: ${e.getMessage}"
          errors += msg
          if (String.valueOf(e.getMessage).toLowerCase
              .contains("rate limit")) done = true
          else page += 1
      }
    }
    DrainResult(pages.result(), errors.result())
  }
}
