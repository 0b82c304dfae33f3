package graft.sources.rest

import org.scalatest.funsuite.AnyFunSuite

/** The connector-level throttle/transient-failure retry policy
  * (429/5xx with bounded exponential backoff, Retry-After honored) —
  * pure unit laws; the wire-level behavior is in HttpTransportSpec
  * and the end-to-end scan behavior in RestSourceSpec. */
class RestRetrySpec extends AnyFunSuite {

  private val p = RetryPolicy(maxRetries = 3, baseMs = 500L, maxMs = 4000L)

  test("backoff schedule: exponential from baseMs, capped at maxMs") {
    assert(RestRetry.backoffMs(p, 0, None) == 500L)
    assert(RestRetry.backoffMs(p, 1, None) == 1000L)
    assert(RestRetry.backoffMs(p, 2, None) == 2000L)
    assert(RestRetry.backoffMs(p, 3, None) == 4000L)
    assert(RestRetry.backoffMs(p, 10, None) == 4000L) // capped
    assert(RestRetry.backoffMs(p, 62, None) == 4000L) // shift overflow guarded
  }

  test("Retry-After wins over computed backoff, but is still capped") {
    assert(RestRetry.backoffMs(p, 0, Some(1500L)) == 1500L)
    assert(RestRetry.backoffMs(p, 2, Some(0L)) == 0L)
    assert(RestRetry.backoffMs(p, 0, Some(60000L)) == 4000L) // cap holds
  }

  test("only 429 and transient 5xx are retryable; 4xx and other errors fail fast") {
    assert(RestRetry.isRetryable(RestHttpError(429, "throttled")))
    Seq(500, 502, 503, 504).foreach(c =>
      assert(RestRetry.isRetryable(RestHttpError(c, "x")), c.toString))
    Seq(400, 401, 403, 404, 501).foreach(c =>
      assert(!RestRetry.isRetryable(RestHttpError(c, "x")), c.toString))
    assert(!RestRetry.isRetryable(new RuntimeException("not http")))
  }

  private val fast = RetryPolicy(maxRetries = 3, baseMs = 0L, maxMs = 0L)

  test("withRetry: succeeds after k retryable failures, counting each retry") {
    var calls = 0; var retries = 0
    val out = RestRetry.withRetry(fast, () => retries += 1) {
      calls += 1
      if (calls <= 2) throw RestHttpError(429, "busy", Some(0L))
      "ok"
    }
    assert(out == "ok" && calls == 3 && retries == 2)
  }

  test("withRetry: gives up after maxRetries and rethrows the LAST error") {
    var calls = 0
    val e = intercept[RestHttpError] {
      RestRetry.withRetry(fast) { calls += 1; throw RestHttpError(503, s"try$calls") }
    }
    assert(calls == 4 && e.body == "try4") // 1 initial + 3 retries
  }

  test("withRetry: non-retryable errors propagate immediately, no retry spent") {
    var calls = 0
    intercept[RestHttpError] {
      RestRetry.withRetry(fast) { calls += 1; throw RestHttpError(400, "bad soql") }
    }
    assert(calls == 1)
    intercept[IllegalStateException] {
      RestRetry.withRetry(fast) { calls += 1; throw new IllegalStateException("boom") }
    }
    assert(calls == 2)
  }

  test("withRetry: maxRetries=0 is the reference's raise-on-anything discipline") {
    var calls = 0
    intercept[RestHttpError] {
      RestRetry.withRetry(RetryPolicy.Off) { calls += 1; throw RestHttpError(429, "x") }
    }
    assert(calls == 1)
  }

  test("retryingIterator: a throttled page is re-requested, never skipped or duplicated") {
    // unfold over page indices, throwing the FIRST time each odd page
    // is requested — mirrors queryAllPages' state discipline (state
    // advances only on a successful step)
    val attempted = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val it = Iterator.unfold(0) { page =>
      if (page >= 4) None
      else {
        attempted(page) += 1
        if (page % 2 == 1 && attempted(page) == 1)
          throw RestHttpError(429, s"page$page", Some(0L))
        Some((Seq(s"id$page"), page + 1))
      }
    }
    var retries = 0
    val pages = RestRetry.retryingIterator(fast, () => retries += 1)(it).toList
    assert(pages == List(Seq("id0"), Seq("id1"), Seq("id2"), Seq("id3")))
    assert(retries == 2 && attempted(1) == 2 && attempted(3) == 2)
    assert(attempted(0) == 1 && attempted(2) == 1) // clean pages fetched once
  }

  test("options: policy resolves from lowercased DSv2 options with defaults") {
    assert(RetryPolicy.fromOptions(Map.empty) == RetryPolicy(3, 500L, 30000L))
    assert(RetryPolicy.fromOptions(Map("maxretries" -> "0")).maxRetries == 0)
    assert(RetryPolicy.fromOptions(
      Map("maxretries" -> "5", "retrybasems" -> "10", "retrymaxms" -> "20")) ==
      RetryPolicy(5, 10L, 20L))
    intercept[IllegalArgumentException] {
      RetryPolicy.fromOptions(Map("retrybasems" -> "100", "retrymaxms" -> "50"))
    }
  }

  // ----------------------------------------- mutation retry class (r15)
  // r14 advice (medium): an upsert WITHOUT Id is a POST create, and a
  // gateway 5xx can arrive AFTER the server committed the insert — an
  // automatic retry would create a duplicate record. The mutation path
  // therefore retries 5xx only for keyed (idempotent PATCH) records;
  // 429 — admission refused before any work — always retries.

  test("mutation class: 429 retries for keyed AND unkeyed; 5xx only for keyed") {
    for (s <- Seq(500, 502, 503, 504)) {
      assert(RestRetry.isMutationRetryable(RestHttpError(s, "x"), idempotent = true))
      assert(!RestRetry.isMutationRetryable(RestHttpError(s, "x"), idempotent = false),
        s"unkeyed create must NOT auto-retry a $s — the insert may have committed")
    }
    assert(RestRetry.isMutationRetryable(RestHttpError(429, "x"), idempotent = false))
    assert(RestRetry.isMutationRetryable(RestHttpError(429, "x"), idempotent = true))
    assert(!RestRetry.isMutationRetryable(RestHttpError(400, "x"), idempotent = true))
    assert(!RestRetry.isMutationRetryable(new IllegalStateException, idempotent = true))
  }

  test("withMutationRetry: an unkeyed create's 502 propagates on the FIRST failure; a keyed update's 502 is absorbed") {
    val fast = RetryPolicy(maxRetries = 3, baseMs = 0L, maxMs = 0L)
    var creates = 0
    intercept[RestHttpError] {
      RestRetry.withMutationRetry(fast, idempotent = false) {
        creates += 1; throw RestHttpError(502, "gateway")
      }
    }
    assert(creates == 1, "the create must not be re-sent — it may have committed")
    var patches = 0
    val out = RestRetry.withMutationRetry(fast, idempotent = true) {
      patches += 1
      if (patches < 3) throw RestHttpError(502, "gateway") else "ok"
    }
    assert(out == "ok" && patches == 3)
    // 429 is admission-refused-before-work: retried even for creates
    var throttled = 0
    val out2 = RestRetry.withMutationRetry(fast, idempotent = false) {
      throttled += 1
      if (throttled < 2) throw RestHttpError(429, "busy") else "created"
    }
    assert(out2 == "created" && throttled == 2)
  }

  // ------------------------------------ record-loop envelope (r15 advice)
  // an escaping RestHttpError in a record-loop caller fails the Spark
  // task, and task retry replays the WHOLE partition's upserts —
  // re-POSTing already-committed unkeyed creates. mutationToEnvelope
  // therefore converts every escape into the record-level envelope.

  test("mutationToEnvelope: unkeyed create's 502 becomes a Left on the FIRST failure, never a throw") {
    val fast = RetryPolicy(maxRetries = 3, baseMs = 0L, maxMs = 0L)
    var creates = 0
    val out = RestRetry.mutationToEnvelope(fast, keyed = false) {
      creates += 1; throw RestHttpError(502, "gateway")
    }
    assert(creates == 1, "the create must not be re-sent — it may have committed")
    assert(out.isLeft && out.swap.exists(_.contains("unkeyed create")),
      s"envelope must name the unkeyed-create path: $out")
  }

  test("mutationToEnvelope: keyed 5xx and any 429 exhaust their retries, then envelope as 'retries exhausted'") {
    val fast = RetryPolicy(maxRetries = 2, baseMs = 0L, maxMs = 0L)
    var patches = 0
    val keyedOut = RestRetry.mutationToEnvelope(fast, keyed = true) {
      patches += 1; throw RestHttpError(503, "down")
    }
    assert(patches == 3 && keyedOut.swap.exists(_.contains("retries exhausted")))
    var throttled = 0
    val createOut = RestRetry.mutationToEnvelope(fast, keyed = false) {
      throttled += 1; throw RestHttpError(429, "busy")
    }
    assert(throttled == 3 && createOut.swap.exists(_.contains("retries exhausted")),
      "an exhausted 429 on a create must envelope, not throw — a task " +
        "replay would re-POST the partition's committed creates")
  }

  test("mutationToEnvelope: success and transport-level Left pass through untouched") {
    val fast = RetryPolicy(maxRetries = 1, baseMs = 0L, maxMs = 0L)
    assert(RestRetry.mutationToEnvelope(fast, keyed = true)(Right("id1")) == Right("id1"))
    assert(RestRetry.mutationToEnvelope(fast, keyed = false)(
      Left("HTTP 400: bad")) == Left("HTTP 400: bad"))
  }

  test("slept backoff never exceeds maxMs even with jitter (r14 advice: jitter inside the cap)") {
    // maxMs = 50: pre-fix, +25% jitter on a capped 50 ms could sleep
    // ~62 ms; three retries at the cap must now stay under ~3*50 plus
    // scheduler slack. Generous bound — this is a contract test, not
    // a timing benchmark.
    val tight = RetryPolicy(maxRetries = 3, baseMs = 50L, maxMs = 50L)
    val t0 = System.nanoTime()
    intercept[RestHttpError] {
      RestRetry.withMutationRetry(tight, idempotent = true) {
        throw RestHttpError(503, "x", retryAfterMs = Some(5000L))
      }
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // Retry-After asked for 5 s ×3; the cap must have bounded each
    // sleep to ≤50 ms (jitter included)
    assert(elapsedMs < 1500L, s"slept too long: ${elapsedMs}ms — jitter or " +
      "Retry-After escaped the maxMs cap")
  }
}
