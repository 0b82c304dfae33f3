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
}
