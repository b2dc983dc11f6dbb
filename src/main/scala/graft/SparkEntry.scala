package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{ScalarQueries, UdfQueries}
import graft.operators._
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator category's `queries`/`oracle` maps into the
  * single map the driver's Verify/Bench harness consumes. Key uniqueness
  * across categories is asserted at first use (a silent `++` overwrite
  * would make an operator vanish from the correctness gate).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, SURVEY.md §7.1) on sf0.001;
    * driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.flagship(spark, "/root/testdata/sf0.001")

  // a def: LlmQueries/SimilarityQueries build their oracle maps per
  // evaluation (a few SQL strings splice in OracleDir-scoped durable
  // artifact paths), so the category tuples must not be captured once
  private def categories: Seq[(Map[String, Tables.Q], Map[String, String])] =
    Seq(
      (ScanQueries.queries, ScanQueries.oracle),
      (FilterQueries.queries, FilterQueries.oracle),
      (AggQueries.queries, AggQueries.oracle),
      (JoinQueries.queries, JoinQueries.oracle),
      (WindowQueries.queries, WindowQueries.oracle),
      (SetQueries.queries, SetQueries.oracle),
      (ScalarQueries.queries, ScalarQueries.oracle),
      (UdfQueries.queries, UdfQueries.oracle),
      (LlmQueries.queries, LlmQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (SimilarityQueries.queries, SimilarityQueries.oracle),
      (MultimodalQueries.queries, MultimodalQueries.oracle),
      (PipelineQueries.queries, PipelineQueries.oracle),
      (MaintenanceQueries.queries, MaintenanceQueries.oracle),
      (SqlQueries.queries, SqlQueries.oracle),
      (GraphQueries.queries, GraphQueries.oracle),
      (TimeSeriesQueries.queries, TimeSeriesQueries.oracle),
      (StreamingQueries.queries, StreamingQueries.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = categories.flatMap(_._1)
    require(all.size == all.map(_._1).distinct.size,
      "duplicate query key across operator categories")
    all.toMap
  }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). Evaluates
    * under the `OracleDir` lock against the CURRENT dir (sf0.01
    * default) — a few SQL strings splice in dir-scoped durable
    * artifact paths, and an unlocked read racing `oracleSqlFor` on
    * another thread could observe a mid-swap dir and mix scales
    * (r11 ADVICE). Prefer `oracleSqlFor(dir)` to be explicit.
    */
  def oracleSql: Map[String, String] =
    OracleDir.synchronized(buildOracleSql())

  private def buildOracleSql(): Map[String, String] = {
    val all = categories.flatMap(_._2)
    require(all.map(_._1).toSet.subsetOf(queries.keySet),
      "oracle declared for a key with no query")
    all.toMap
  }

  /** Parameterized form (r11 review): evaluate the oracle map FOR a
    * given fixture dir without callers hand-mutating `OracleDir` —
    * the dir-dependence is contained to one synchronized scope, so two
    * callers building maps for different scales in one JVM can't
    * cross-contaminate the artifact paths.
    */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    OracleDir.synchronized {
      val prev = OracleDir.current
      OracleDir.current = sfDir
      try buildOracleSql() finally OracleDir.current = prev
    }
}
