package graft.sources.rest

/** Bounded retry policy for throttled / transiently failing remote
  * calls. The reference raises on any non-200/201/204
  * (revtron/salesforce/main.py:52-53) yet ships a quota probe
  * (main.py:102-104) precisely because real orgs throttle; at the
  * connector's partition-parallel fan-out (S9: numPartitions
  * concurrent writers; S6 phase 2: one fetch per partition) a single
  * REQUEST_LIMIT_EXCEEDED mid-scan would otherwise kill the whole job.
  *
  * Resolved from DSv2 options: `maxRetries` (default 3),
  * `retryBaseMs` (default 500), `retryMaxMs` (default 30000).
  * `maxRetries = 0` disables retry — the reference's raise-on-anything
  * discipline. */
final case class RetryPolicy(maxRetries: Int, baseMs: Long, maxMs: Long) {
  require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
  require(baseMs >= 0, s"retryBaseMs must be >= 0, got $baseMs")
  require(maxMs >= baseMs, s"retryMaxMs ($maxMs) must be >= retryBaseMs ($baseMs)")
}

object RetryPolicy {
  /** The reference's discipline: any non-OK raises immediately. */
  val Off: RetryPolicy = RetryPolicy(0, 0L, 0L)

  /** Keys arrive lowercased (CaseInsensitiveStringMap / RestTable). */
  def fromOptions(options: Map[String, String]): RetryPolicy = RetryPolicy(
    options.getOrElse("maxretries", "3").toInt,
    options.getOrElse("retrybasems", "500").toLong,
    options.getOrElse("retrymaxms", "30000").toLong)
}

/** Executor/driver-side retry wrapper the connector puts around every
  * transport call. Retry scope is deliberately narrow:
  *
  *  - ONLY [[RestHttpError]] with status 429/500/502/503/504 retries.
  *    401 never lands here (the transport re-auths transparently) and
  *    other 4xx are caller errors — retrying them spends quota on a
  *    request that can never succeed.
  *  - Mutations are safe to retry through this path because
  *    [[HttpTransport.upsert]] only rethrows REJECTED admission
  *    (429/5xx raised before the connector sees a result); record-level
  *    failures stay in the never-throwing error envelope.
  *  - A `Retry-After` header wins over computed backoff — the server
  *    knows its own pacing. Otherwise exponential: baseMs · 2^attempt,
  *    capped at maxMs, plus ±25% jitter so a 1000-partition scan that
  *    got throttled in lockstep does not come back in lockstep (the
  *    thundering-herd standard).
  *
  * Exhausted retries rethrow the last error: the task fails LOUDLY
  * (and Spark's own task retry may move it to a calmer moment) rather
  * than silently truncating a scan. */
object RestRetry {

  /** 429 (throttle) + the transient 5xx family. */
  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  def isRetryable(e: Throwable): Boolean = e match {
    case RestHttpError(status, _, _) => RetryableStatuses.contains(status)
    case _ => false
  }

  /** Pure backoff schedule (pre-jitter), unit-testable: Retry-After
    * wins; else baseMs << attempt, capped at maxMs. */
  def backoffMs(policy: RetryPolicy, attempt: Int,
      retryAfterMs: Option[Long]): Long =
    retryAfterMs.map(math.min(_, policy.maxMs)).getOrElse(
      math.min(policy.maxMs, policy.baseMs << math.min(attempt, 30)))

  private def jittered(ms: Long): Long =
    if (ms <= 0) 0L
    else {
      val quarter = math.max(1L, ms / 4)
      ms - quarter + java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(2 * quarter)
    }

  /** Run `op`, retrying retryable failures up to `policy.maxRetries`
    * times. `onRetry` fires once per retry (metrics hook). */
  def withRetry[T](policy: RetryPolicy, onRetry: () => Unit = () => ())
      (op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: RestHttpError if isRetryable(e) && attempt < policy.maxRetries =>
          val ms = backoffMs(policy, attempt, e.retryAfterMs)
          onRetry()
          if (ms > 0) Thread.sleep(jittered(ms))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Same-page retry for a LAZY paged iterator (the S6 id cursor):
    * construction (by-name — some transports admit/refuse at call
    * time) and each `hasNext`/`next` step are wrapped individually.
    * The underlying `Iterator.unfold` advances its state only on a
    * successful step, so a retried `hasNext` re-requests the SAME
    * page — no page is skipped and none is fetched twice on success. */
  def retryingIterator[A](policy: RetryPolicy,
      onRetry: () => Unit = () => ())(it: => Iterator[A]): Iterator[A] =
    new Iterator[A] {
      private var under: Iterator[A] = null
      private def u: Iterator[A] = { if (under == null) under = it; under }
      override def hasNext: Boolean = withRetry(policy, onRetry)(u.hasNext)
      override def next(): A = withRetry(policy, onRetry)(u.next())
    }
}
