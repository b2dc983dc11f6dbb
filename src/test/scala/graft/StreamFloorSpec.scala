package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.streaming.StreamingQueries.Ev

/** Pins the streaming-replay LIFECYCLE FLOOR as a regression gate
  * (r12 VERDICT task 7). The r12 StreamProbe decomposition measured a
  * warm per-stateful-replay floor of ~0.15 s incremental planning +
  * ~0.14 s offset/WAL/getBatch + ~0.3 s query start/stop (+ addBatch
  * real work on top) — prose in BASELINE.md until now. This spec runs
  * a MINIMAL stateful replay (100-row file source → running count →
  * memory sink, fresh checkpoint each time) three times warm and
  * asserts the min wall time stays under 2× that floor, so the next
  * "stream family slow" driver leg is classifiable: if this spec is
  * green on the same binary, the per-replay lifecycle did not regress
  * and the spike is box weather (the BENCH calibration preamble's
  * complement on the test side).
  *
  * Weather-hardening: the gate scales with the same fixed-work spin
  * calibration Bench embeds in every leg — on a throttled box the
  * threshold loosens proportionally instead of flaking, and a
  * genuinely regressed lifecycle (extra batches, session rebuilds,
  * store re-opens) still trips it at any spin speed.
  */
class StreamFloorSpec extends SparkSpecBase {

  /** Quiet-box per-replay lifecycle floor (seconds) for the minimal
    * pipeline below: planning + offset/WAL + start/stop + a ~100-row
    * addBatch, measured 2026-08-16 on a 2.1 ns/op box: min of 3 warm
    * replays 1.31 s (runs 1.36/1.33/1.31 at weather ×1.01) —
    * consistent with the r12 StreamProbe anatomy (~0.6 s lifecycle +
    * HDFS-backed memory-sink checkpoint + 2-partition state commits).
    * The gate is 2× this.
    */
  private val floorQuietSec = 1.31
  /** Spin speed of the box the floor was measured on (ns/op). */
  private val calibQuietNsPerOp = 2.1

  private def spinNsPerOp(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val n = 200000000L
    val t0 = System.nanoTime()
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val dt = System.nanoTime() - t0
    if (x == 42L) System.err.println("calib")
    dt.toDouble / n
  }

  test("warm per-replay lifecycle cost stays within 2x the quiet floor") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    import s.implicits._
    val base = TempDirs.scoped("floor_probe", sfDir)
    TempDirs.clearDir(base)
    val srcDir = s"$base/src"
    // 100 rows, one file: the smallest real feed — addBatch is then
    // dominated by lifecycle, which is what this spec pins
    Tables.events(s, sfDir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .limit(100).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    def replay(i: Int): Double = {
      val uname = s"floor_probe_$i"
      val t0 = System.nanoTime()
      val q = s.readStream
        .schema(Encoders.product[Ev].schema)
        .parquet(srcDir)
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            Iterator((user, n))
        }.toDF("user_id", "n")
        .writeStream.format("memory").queryName(uname)
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$base/ckpt_$i")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = s.table(uname).count()
      s.catalog.dropTempView(uname)
      assert(rows > 0, "floor probe replay produced no rows")
      (System.nanoTime() - t0) / 1e9
    }

    replay(0) // warm-up: absorbs codegen + parquet footer caching
    val times = (1 to 3).map(replay)
    val best = times.min
    val weather = math.max(1.0, spinNsPerOp() / calibQuietNsPerOp)
    val gate = 2.0 * floorQuietSec * weather
    info(f"per-replay min ${best}%.3f s (runs ${times.map(t => f"$t%.2f").mkString("/")}), " +
      f"gate ${gate}%.2f s (weather x$weather%.2f)")
    assert(best <= gate,
      f"per-replay lifecycle ${best}%.3f s exceeds ${gate}%.3f s " +
        "(2x quiet floor, weather-scaled) — a structural regression, " +
        "not box noise: check for extra micro-batches, session " +
        "rebuilds, or state-store re-opens per replay")
  }
}
