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
    * Production would wrap java.net.http.HttpClient with the auth headers
    * and 30 s timeout; tests inject fixtures. */
  type Transport = PageRequest => String

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

  /** CLOSED → OPEN after `failureThreshold` consecutive failures;
    * OPEN → HALF_OPEN after `recoveryTimeoutMs`; HALF_OPEN success closes
    * it again (reference: etl/etl.py:131-161). `clock` injectable. */
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

  /** Drain pages 1..maxPages with the reference's stop conditions
    * (etl/etl.py:617-659): stop on empty page, on partial page
    * (< resultsPerPage) and when the cumulative count reaches
    * SearchResultCountAll. Returns raw page payloads in arrival order. */
  def drainPages(transport: Transport, counts: String => PageCounts,
      keyword: String, location: Option[String] = None, maxPages: Int = 20,
      resultsPerPage: Int = 500, limiter: Option[RateLimiter] = None,
      breaker: Option[CircuitBreaker] = None): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var fetched = 0L
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      limiter.foreach(_.acquire())
      val fetch = () => transport(
        PageRequest(keyword, page, resultsPerPage, location))
      val payload = breaker match {
        case Some(b) => retry()(() => b.call(fetch))
        case None => retry()(fetch)
      }
      val c = counts(payload)
      if (c.resultCount == 0) done = true
      else {
        pages += payload
        fetched += c.resultCount
        if (c.resultCount < resultsPerPage) done = true
        if (c.resultCountAll > 0 && fetched >= c.resultCountAll) done = true
        page += 1
      }
    }
    pages.result()
  }
}
