package graft

import org.apache.spark.sql.functions._

/** The native as-of join (graft.plans.AsofJoin: custom LogicalPlan +
  * Strategy + merge-walk BinaryExecNode) must be row-identical to the
  * window-spelled join_asof under any input partitioning, and must
  * actually plan through the custom exec.
  */
class AsofJoinNativeSpec extends SparkSpecBase {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq

  test("native as-of join equals the window spelling row for row") {
    assert(rows("join_asof_native") == rows("join_asof"))
  }

  test("the plan contains AsofJoinExec (the custom strategy fired)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val ev = Tables.events(s2, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val sg = Tables.events(s2, sfDir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"))
    val df = graft.plans.AsofJoinApi.asofJoin(s2, ev, sg,
      "user_id", "ts_us", "ts_us", "asof_us")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan")
    // EnsureRequirements must have inserted the co-partitioning
    // exchanges + sorts the exec DECLARES rather than hand-schedules
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("downstream same-key aggregation reuses the join's partitioning") {
    // the exec advertises left.outputPartitioning, so a groupBy on the
    // same key must plan with exactly the join's two exchanges — a
    // third Exchange means the property was dropped
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val ev = Tables.events(s2, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val sg = Tables.events(s2, sfDir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"))
    val agg = graft.plans.AsofJoinApi.asofJoin(s2, ev, sg,
        "user_id", "ts_us", "ts_us", "asof_us")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(nExchanges == 2,
      s"expected 2 exchanges (join inputs only), got $nExchanges:\n$plan")
  }

  test("result survives adversarial input repartitioning") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    def run(lParts: Int, rParts: Int) = {
      val ev = Tables.events(s2, sfDir)
        .select(col("event_id"), col("user_id"), col("ts_us"))
        .repartition(lParts, col("event_id")) // WRONG key on purpose
      val sg = Tables.events(s2, sfDir)
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts_us"))
        .repartition(rParts) // round-robin on purpose
      graft.plans.AsofJoinApi.asofJoin(s2, ev, sg,
          "user_id", "ts_us", "ts_us", "asof_us")
        .orderBy(col("event_id"))
        .collect().map(_.toString).toSeq
    }
    assert(run(7, 3) == run(1, 13))
  }

  test("empty right side yields all-null as-of times") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq.empty[(Long, Long)].toDF("user_id", "ts_us")
    val got = graft.plans.AsofJoinApi.asofJoin(s2, left, right,
        "user_id", "ts_us", "ts_us", "asof_us")
      .orderBy("event_id").collect()
    assert(got.length == 2 && got.forall(_.isNullAt(3)))
  }

  test("forward direction matches the window spelling's next_us") {
    // join_asof_nearest's next_us column IS the forward contract
    // (earliest right with ts >= t) — the native forward walk must
    // agree row for row
    val win = SparkEntry.queries("join_asof_nearest")(spark, sfDir)
      .select(col("event_id"), col("next_us")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val native = SparkEntry.queries("join_asof_native_fwd")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(native.nonEmpty && native == win)
  }

  test("forward semantics: equal-time matches, strictly-earlier does not") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val left = Seq((1L, 5L, 100L), (2L, 5L, 101L), (3L, 5L, 300L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((5L, 100L), (5L, 250L)).toDF("user_id", "ts_us")
    val got = graft.plans.AsofJoinApi.asofJoin(s2, left, right,
        "user_id", "ts_us", "ts_us", "next_us", forward = true)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    // t=100 matches the equal-time 100; t=101 skips it (already past)
    // and takes 250; t=300 has nothing ahead
    assert(got == Seq((1L, 100L), (2L, 250L), (3L, null)))
  }

  test("strict-before semantics: an equal-time right row does not match") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    val left = Seq((1L, 5L, 100L), (2L, 5L, 101L), (3L, 6L, 100L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((5L, 100L), (5L, 90L), (7L, 50L))
      .toDF("user_id", "ts_us")
    val got = graft.plans.AsofJoinApi.asofJoin(s2, left, right,
        "user_id", "ts_us", "ts_us", "asof_us")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    // t=100: only the 90 row is strictly before; t=101: the 100 row
    // wins; user 6 has no right rows at all
    assert(got == Seq((1L, 90L), (2L, 100L), (3L, null)))
  }
}
