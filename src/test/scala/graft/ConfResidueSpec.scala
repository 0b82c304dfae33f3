package graft

/** Conf-restore discipline for the gate queries that MUTATE session
  * state (r15): the streaming gates transiently shrink
  * `spark.sql.shuffle.partitions` (state-store overhead) and the CC
  * stress gates force AQE skew confs — in the interleaved bench suite
  * a single leaked conf would silently poison every later query's
  * timing AND potentially its plan (a leaked partitions=4 would run
  * the TPC-H joins on 4 tasks). Each gate must leave the session
  * VALUE-identical on every conf it touches.
  *
  * Two-layer check:
  *  1. VALUE identity on the watchlist (every conf any gate
  *     saves/restores), compared through `conf.getOption`, which
  *     resolves SQL-conf defaults — so the benign unset→explicitly-
  *     set-to-default round-trip (save reads the default, restore
  *     pins it) passes, while any changed value fails.
  *  2. No NEW explicitly-set conf outside watchlist ∪ exempt (the
  *     `Fx.t` parquet chokepoint confs, set unconditionally on every
  *     fixture read by design). */
class ConfResidueSpec extends SparkSpec {

  private val exempt = Set(
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.parquet.inferTimestampNTZ.enabled")

  private val watch = Seq(
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.forceOptimizeSkewedJoin",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")

  private def resolved: Map[String, Option[String]] =
    watch.map(k => k -> spark.conf.getOption(k)).toMap

  for (q <- Seq("q307_session_stream", "q314_tumbling_stream",
      "q331_cc_skew", "q335_cc_autosalt", "q338_ivfpq_index_table")) {
    test(s"$q leaves every session conf value-identical") {
      val valuesBefore = resolved
      val setBefore = spark.conf.getAll.keySet
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val valuesAfter = resolved
      watch.foreach(k => assert(valuesBefore(k) == valuesAfter(k),
        s"$q leaked $k: ${valuesBefore(k)} -> ${valuesAfter(k)}"))
      val newlySet = spark.conf.getAll.keySet -- setBefore -- exempt -- watch
      assert(newlySet.isEmpty,
        s"$q set confs outside its declared save/restore set: $newlySet")
    }
  }
}
