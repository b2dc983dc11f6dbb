package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key behavior of the native AsofJoinExec (r11 verdict #6): the
  * exec declares ClusteredDistribution + per-partition ordering and
  * claims "a hot key costs time, never memory" — its merge walk keeps
  * ONE stashed right row regardless of how many rows share a key,
  * with any memory pressure confined to the spilling SortExecs that
  * EnsureRequirements plans below it. This spec builds a fixture
  * where ONE key owns 50% of both sides (the salting-playbook
  * trigger for ordinary joins), runs the native exec AND the
  * window-function spelling of the same as-of semantics, and asserts
  * byte-equal results — plus that the native plan really contains
  * AsofJoinExec (no silent fallback). Wall-times of both spellings
  * print as `ASOF_SKEW` lines; BASELINE.md records them per round.
  */
class AsofSkewSpec extends SparkSpecBase {

  test("native as-of equals the window spelling when one key holds " +
    "50% of a 500k-row left side") {
    val nL = 500000L
    val nR = 20000L
    // even ids -> the hot key 42; odd ids spread over ~1000 cold keys
    def keyOf(idCol: org.apache.spark.sql.Column) =
      when(pmod(idCol, lit(2)) === 0, lit(42L))
        .otherwise(pmod(idCol, lit(997L)) + 1000L)
    val left = spark.range(nL).select(
      keyOf(col("id")).as("k"), col("id").as("t"), col("id").as("lid"))
    val right = spark.range(nR).select(
      keyOf(col("id")).as("rk"), (col("id") * 47L).as("rt"),
      col("id").as("rid"))

    val native = graft.plans.AsofJoinApi.asofJoin(spark, left, right,
        leftKeyCol = "k", rightKeyCol = "rk",
        leftTimeCol = "t", rightTimeCol = "rt",
        rightTiebreak = Seq("rid"))
      .select(col("lid"), col("rt"), col("rid"))
    assert(native.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.AsofJoinExec => e
      }.nonEmpty,
      "native spelling did not plan through AsofJoinExec")
    val nativeRows = native.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
    // warm wall-time (run 1 above absorbed codegen/exchange setup);
    // sum(rt) forces the match computation — a bare count() would let
    // the optimizer prune the operator away on the window side
    val tN0 = System.nanoTime()
    native.agg(sum(col("rt"))).collect()
    val tNative = (System.nanoTime() - tN0) / 1e9

    // window spelling: union both sides, order (t, side, rid) within
    // each key — right rows at EQUAL time sort after left rows, so a
    // strictly-backward frame can never see them — and take the max
    // (rt, rid) struct over the preceding frame (max rt wins, rid
    // breaks right-side ties, matching the exec's tiebreak contract)
    val combined = left
      .select(col("k"), col("t"), col("lid"),
        lit(null).cast("long").as("rt"), lit(null).cast("long").as("rid"),
        lit(0).as("side"))
      .unionByName(right.select(col("rk").as("k"), col("rt").as("t"),
        lit(null).cast("long").as("lid"), col("rt"), col("rid"),
        lit(1).as("side")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val windowed = combined
      .withColumn("m",
        max(when(col("side") === 1, struct(col("rt"), col("rid"))))
          .over(w))
      .filter(col("side") === 0)
      .select(col("lid"), col("m.rt").as("rt"), col("m.rid").as("rid"))
    val windowRows = windowed.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
    val tW0 = System.nanoTime()
    windowed.agg(sum(col("rt"))).collect()
    val tWindow = (System.nanoTime() - tW0) / 1e9

    assert(nativeRows.length == nL)
    assert(nativeRows.sameElements(windowRows),
      s"hot-key divergence: first diff at " +
        nativeRows.zip(windowRows).indexWhere(p => p._1 != p._2))
    println(f"ASOF_SKEW native=$tNative%.2fs window=$tWindow%.2fs " +
      f"(one key = 50%% of $nL rows)")
  }
}
