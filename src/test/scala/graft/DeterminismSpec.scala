package graft

/** Every oracle-paired query must produce the IDENTICAL row sequence
  * under a different shuffle-partition count (7 vs the base 4): a
  * non-total ORDER BY or partition-order-dependent aggregate would pass
  * the DuckDB compare by luck locally and flake at the driver's scale —
  * this catches it proactively. (SURVEY.md §5.3.1.)
  */
class DeterminismSpec extends SparkSpecBase {

  /** Streaming replays and write-heavy round-trips are slow and already
    * covered by their own parity/round-trip suites.
    */
  private val skip = Set(
    "stream_watermark_late", "stream_dedup", "stream_stateful_count",
    "stream_tws_running_sum", "join_bucketed", "scan_csv_roundtrip",
    "scan_json_roundtrip", "sink_partitioned", "scan_parquet_multifile",
    // double-run (restart idempotence) in StreamingParitySpec already
    "stream_sink_parquet")

  private lazy val alt = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  SparkEntry.oracleSql.keys.toSeq.sorted.filterNot(skip).foreach { name =>
    test(s"$name is stable across shuffle partitionings") {
      val base = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).toSeq
      val other = SparkEntry.queries(name)(alt, sfDir)
        .collect().map(_.toString).toSeq
      assert(base == other)
    }
  }
}
