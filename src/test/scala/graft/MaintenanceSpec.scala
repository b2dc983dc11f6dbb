package graft

import org.apache.spark.sql.functions._

/** SURVEY.md §2.M — invariants of the incremental-maintenance operators
  * beyond the oracle pairing: MERGE semantics (key uniqueness, op-code
  * partition, source reconciliation) and SCD2 interval algebra
  * (disjoint, gap-free, exactly one open version per entity).
  */
class MaintenanceSpec extends SparkSpecBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("merge_upsert emits each key once and op codes partition the keys") {
    val out = run("merge_upsert").cache()
    val n = out.count()
    assert(out.select("c_custkey").distinct().count() == n)
    val base = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val delta = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val byOp = out.collect()
      .groupBy(_.getString(3)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byOp.keySet == Set("update", "insert", "keep"))
    assert(byOp("update") == (base intersect delta))
    assert(byOp("insert") == (delta diff base))
    assert(byOp("keep") == (base diff delta))
    out.unpersist()
  }

  test("merge_upsert updated rows carry the delta's values") {
    val updated = run("merge_upsert").filter(col("op") === "update")
    assert(updated.filter(col("seg") =!= "UPDATED").count() == 0)
  }

  test("scd2_intervals per entity: disjoint, gap-free, one open version") {
    val out = run("scd2_intervals").cache()
    // exactly one is_current per entity, and it owns the sentinel end
    val open = out.filter(col("is_current") === 1)
    assert(open.count() == out.select("o_custkey").distinct().count())
    assert(open.filter(col("valid_to") =!= lit("9999-12-31").cast("date"))
      .count() == 0)
    // each version's valid_to equals the next version's valid_from
    // (gap-free chain) and valid_from < valid_to (non-degenerate)
    assert(out.filter(col("valid_from") >= col("valid_to")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("valid_from"))
    val chained = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from"))
    assert(chained.count() == 0)
    out.unpersist()
  }
}
