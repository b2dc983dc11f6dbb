package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-encoding canary (r6 VERDICT item 2).
  *
  * Round 6 went RED because the driver silently regenerated
  * `events.parquet` with `ts` as TIMESTAMP(MICROS) where every prior
  * round shipped TIMESTAMP(NANOS), and `Tables.events` had baked the
  * nanos layout in — 34 queries and 83 tests then failed with the same
  * opaque analysis error. This spec makes the next such change fail
  * LOUDLY and LOCALLY:
  *
  *  1. every shipped fixture dir must load through `Tables.events` with
  *     `ts_us` as BIGINT (one clear failure naming the dir, not a
  *     cascade);
  *  2. both supported physical encodings — int64 nanos and
  *     TIMESTAMP(MICROS) — must decode to the SAME `ts_us` values
  *     (pinned against hand-computed micros);
  *  3. an encoding outside the supported set must raise the
  *     IllegalStateException that names the offending type, not a
  *     downstream DATATYPE_MISMATCH.
  */
class FixtureSchemaSpec extends SparkSpecBase {

  private val fixtureDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("every shipped fixture's events table loads with BIGINT ts_us") {
    assert(fixtureDirs.nonEmpty, "no fixture dirs found — TESTDATA moved?")
    fixtureDirs.foreach { d =>
      val ev = Tables.events(spark, d)
      val raw = Tables.table(spark, d, "events").schema("ts").dataType
      assert(ev.schema("ts_us").dataType == LongType,
        s"$d: events.ts loaded as $raw but ts_us is " +
          s"${ev.schema("ts_us").dataType}, expected BIGINT")
      assert(ev.schema("ts_ts").dataType == TimestampType, s"$d: ts_ts type")
      // analysis alone is the canary; one row proves the read executes
      assert(ev.select("ts_us").limit(1).count() == 1L, s"$d: events empty")
    }
  }

  test("nanos-int64 and micros-timestamp encodings decode identically") {
    import spark.implicits._
    val dir = TempDirs.scoped("fixture_canary", "unitflip")
    // 2024-03-01T00:00:00Z = 1709251200 s; plus 1.5 ms to exercise the
    // sub-millisecond tail that double division would corrupt
    val micros = Seq(1709251200000000L, 1709251200001500L, 1709337600999999L)
    TempDirs.writeOnce("fixture_canary_unitflip") {
      micros.map(us => (1L, us * 1000L)).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
      // NTZ cast writes parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
      // — byte-for-byte the round-6 fixture encoding
      micros.toDF("us")
        .select(lit(1L).as("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(s"$dir/micros/events.parquet")
    }
    def tsUs(sub: String): Seq[Long] =
      Tables.events(spark, s"$dir/$sub").select("ts_us")
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(tsUs("nanos") == micros, "int64-nanos fixture decoded wrong")
    assert(tsUs("micros") == micros, "timestamp-micros fixture decoded wrong")
  }

  test("an unsupported ts encoding fails loudly, naming the type") {
    import spark.implicits._
    val dir = TempDirs.scoped("fixture_canary", "badunit")
    TempDirs.writeOnce("fixture_canary_badunit") {
      Seq((1L, "2024-03-01T00:00:00Z")).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("StringType"),
      s"error must name the offending encoding, got: ${e.getMessage}")
  }
}
