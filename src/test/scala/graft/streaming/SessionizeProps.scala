package graft.streaming

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import java.sql.Timestamp

/** Property: [[Streams.sessionizeBatch]] (window-function gaps-and-
  * islands over Spark, microsecond gap arithmetic) equals a direct
  * in-memory sessionizer on random event sets — including sub-second
  * gap offsets, which whole-second truncation would mis-assign. */
object SessionizeProps extends Properties("graft.streaming.sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def tsUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  // events as (user, micros-since-epoch); distinct ts per user so the
  // result is order-unambiguous without a tie-break column
  private val genEvents: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 24)
    rows <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 4L)
      // cluster around multiples of the gap so both sides of the
      // boundary are exercised, with ±2s of micro-jitter
      k <- Gen.chooseNum(0L, 6L)
      j <- Gen.chooseNum(-2000000L, 2000000L)
    } yield (u, 1700000000000000L + k * 60000000L + j))
  } yield rows.distinct // (u, ts) pairs unique ⇒ ts unique per user

  /** Direct sessionizer: sort per user, new session when diff > gapUs. */
  private def ref(events: List[(Long, Long)], gapUs: Long): Set[(Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.map(_._2).distinct.sorted
      var sid = 0L
      var prev = Option.empty[Long]
      val ids = sorted.map { t =>
        if (prev.forall(p => t - p > gapUs)) sid += 1
        prev = Some(t)
        sid
      }
      ids.groupBy(identity).map { case (s, g) => (u, s, g.size.toLong) }
    }.toSet

  property("sessionizeBatch == direct sessionizer (micros gaps)") =
    Prop.forAll(genEvents, Gen.chooseNum(1, 3)) { (events, gapMin) =>
      val df = events.map { case (u, us) => (u, tsUs(us)) }.toDF("user_id", "ts")
      val got = Streams.sessionizeBatch(df, "ts", "user_id", gapMin)
        .select("user_id", "session_id", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      got == ref(events, gapMin * 60000000L)
    }
}
