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
  *  - READ path ([[withRetry]]): ONLY [[RestHttpError]] with status
  *    429/500/502/503/504 retries. 401 never lands here (the
  *    transport re-auths transparently) and other 4xx are caller
  *    errors — retrying them spends quota on a request that can never
  *    succeed. Reads are side-effect-free, so the full transient
  *    family is safe.
  *  - MUTATION path ([[withMutationRetry]], r14 advice): 429 always
  *    retries — it is an admission refusal raised BEFORE the server
  *    does work, so a retry can never duplicate. A transient 5xx on
  *    an UNKEYED create (no Id → POST, reference main.py:236) can
  *    arrive AFTER the server committed the insert — a gateway
  *    502/504 on the response leg — so an automatic retry would
  *    create a duplicate record; 5xx therefore retries only when the
  *    record carries its idempotency key (Id present → PATCH update,
  *    idempotent by construction). An unkeyed create's 5xx propagates
  *    to the caller's record-level error envelope instead.
  *  - A `Retry-After` header wins over computed backoff — the server
  *    knows its own pacing. Otherwise exponential: baseMs · 2^attempt,
  *    plus ±25% jitter so a 1000-partition scan that got throttled in
  *    lockstep does not come back in lockstep (the thundering-herd
  *    standard). The SLEPT value is capped at maxMs AFTER jitter —
  *    jitter can never push the wait past the configured ceiling or
  *    past a server-sent Retry-After bound by it (r14 advice).
  *
  * Exhausted READ retries rethrow the last error: the task fails
  * LOUDLY (and Spark's own task retry may move it to a calmer moment)
  * rather than silently truncating a scan — reads are side-effect-
  * free, so a partition replay costs only time. MUTATION record-loop
  * callers instead route every escaping [[RestHttpError]] into the
  * record-level envelope via [[RestRetry.mutationToEnvelope]]: a
  * thrown error there would trigger a partition replay that re-POSTs
  * already-committed unkeyed creates (r15 advice). */
object RestRetry {

  /** 429 (throttle) + the transient 5xx family. */
  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  def isRetryable(e: Throwable): Boolean = e match {
    case RestHttpError(status, _, _) => RetryableStatuses.contains(status)
    case _ => false
  }

  /** Mutation-path retry class: see the object scaladoc. `idempotent`
    * = the record carries its key (a retried PATCH re-applies the
    * same state; a retried POST creates a second record). */
  def isMutationRetryable(e: Throwable, idempotent: Boolean): Boolean =
    e match {
      case RestHttpError(429, _, _) => true
      case RestHttpError(status, _, _) =>
        idempotent && RetryableStatuses.contains(status)
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

  /** Run `op`, retrying READ-path retryable failures up to
    * `policy.maxRetries` times. `onRetry` fires once per retry
    * (metrics hook). */
  def withRetry[T](policy: RetryPolicy, onRetry: () => Unit = () => ())
      (op: => T): T =
    retryLoop(policy, isRetryable, onRetry)(op)

  /** [[withRetry]] with the MUTATION retry class: 429 always, 5xx
    * only when `idempotent` (see the object scaladoc). */
  def withMutationRetry[T](policy: RetryPolicy, idempotent: Boolean,
      onRetry: () => Unit = () => ())(op: => T): T =
    retryLoop(policy, isMutationRetryable(_, idempotent), onRetry)(op)

  /** [[withMutationRetry]] for a RECORD-LOOP caller (the status frame
    * / DSv2 writer): any [[RestHttpError]] that still escapes the
    * retry loop is converted to the record-level error envelope
    * instead of rethrown (r15 advice). Rationale: these callers
    * process many records per Spark task, so a thrown error fails the
    * task and task retry REPLAYS THE WHOLE PARTITION's upserts —
    * re-POSTing every already-committed unkeyed create in it, a far
    * wider duplicate window than the single record the envelope
    * marks failed. Only two error shapes can reach the catch (the
    * transport already envelopes non-retryable statuses itself):
    * a retryable status whose bounded retries exhausted, or an
    * unkeyed create's transient 5xx that the mutation class refuses
    * to auto-retry; the envelope text names which. */
  def mutationToEnvelope(policy: RetryPolicy, keyed: Boolean,
      onRetry: () => Unit = () => ())
      (op: => Either[String, String]): Either[String, String] =
    try withMutationRetry(policy, keyed, onRetry)(op)
    catch {
      case RestHttpError(status, b, _) =>
        val why =
          if (!keyed && status != 429)
            "unkeyed create: transient error not auto-retried — a " +
              "retry could duplicate a committed insert"
          else "retries exhausted"
        Left(s"HTTP $status ($why): $b")
    }

  private def retryLoop[T](policy: RetryPolicy,
      retryable: Throwable => Boolean, onRetry: () => Unit)(op: => T): T = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: RestHttpError if retryable(e) && attempt < policy.maxRetries =>
          val ms = backoffMs(policy, attempt, e.retryAfterMs)
          onRetry()
          // jitter INSIDE the cap: the contract is "never sleeps past
          // maxMs", and jitter must not break it (r14 advice)
          if (ms > 0) Thread.sleep(math.min(policy.maxMs, jittered(ms)))
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
