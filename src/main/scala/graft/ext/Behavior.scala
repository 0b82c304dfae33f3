package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the event stream — the product-
  * analytics query family (cohort retention, conversion funnels) that
  * every event pipeline ends up hand-rolling. Companions to the
  * time-domain operators in [[graft.streaming.Streams]] (sessionize)
  * and [[History]] (SCD2): those reshape the timeline, these aggregate
  * user trajectories.
  *
  * Scale shape: every step is a hash aggregate or equi-join ON THE
  * USER KEY — one partitioning reused end-to-end, no windows over the
  * event stream, no driver state. Event-type filters prune before any
  * exchange.
  */
object Behavior {

  /** Cohort RETENTION matrix: users bucketed by the calendar date of
    * their first event (the cohort), counted on each later active day
    * as an offset from that date — the "day-N retention" table.
    * Returns (cohort_date date, offset_days long, n_users long);
    * offset 0 is the cohort's own size. A user counts once per
    * (cohort, offset) however many events they fired that day. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(first, Seq(userCol))
      .select(col(userCol), col("cohort_date"),
        datediff(col("__d"), col("cohort_date")).cast("long").as("offset_days"))
      .distinct()
      .groupBy(col("cohort_date"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered conversion FUNNEL: how many users performed the stages in
    * sequence — stage k counts users whose earliest stage-k event
    * strictly follows their committed stage-(k−1) time (the standard
    * first-touch funnel; re-orderings don't count, repeats collapse to
    * the earliest qualifying event).
    *
    * One conditional-aggregation pass per stage over the user key —
    * stages.length tiny scans, never a per-user sequence sort.
    * Returns (stage long, event_type string, n_users long), stage
    * 1-indexed in funnel order. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    // per user: earliest qualifying time per stage, built left-to-right
    val perUser = stages.zipWithIndex.foldLeft(
      events.select(col(userCol)).distinct()) { case (acc, (stage, i)) =>
      val evs = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__t"))
      val qualified =
        if (i == 0) evs
        else evs.join(acc.select(col(userCol), col(s"__s${i - 1}")), Seq(userCol))
          .filter(col("__t") > col(s"__s${i - 1}"))
          .select(col(userCol), col("__t"))
      acc.join(
        qualified.groupBy(col(userCol)).agg(min(col("__t")).as(s"__s$i")),
        Seq(userCol), "left")
    }
    val counts = perUser.select(
      (0 until stages.size).map(i =>
        sum(when(col(s"__s$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i")): _*)
    val stageRows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1L).as("stage"), lit(stage).as("event_type"),
        col(s"__n$i").as("n_users"))
    }
    counts.select(explode(array(stageRows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.n_users"))
  }
}
