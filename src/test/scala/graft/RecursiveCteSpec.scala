package graft

import org.apache.spark.sql.functions._

/** Spark 4 recursive CTE coverage: the engine feature
  * `sql_recursive_cte` builds on, plus the documented limitation its
  * design works around (only UNION ALL recursion is supported, so
  * recursive queries must be acyclic-by-construction — a cyclic
  * transitive closure cannot terminate and is correctly rejected).
  */
class RecursiveCteSpec extends SparkSpecBase {

  test("UNION ALL recursion executes (monotone counter)") {
    val r = spark.sql(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
      .head().getLong(0)
    assert(r == 15L)
  }

  test("UNION-distinct recursion is rejected (the sql_recursive_cte design constraint)") {
    val e = intercept[Exception] {
      spark.sql(
        "WITH RECURSIVE r(v) AS (SELECT 1 UNION SELECT CASE WHEN v = 1 THEN 2 ELSE 1 END FROM r) SELECT count(*) FROM r")
        .collect()
    }
    assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"),
      e.getMessage.take(200))
  }

  test("sql_recursive_cte produces a dense, gap-free daily calendar") {
    val rows = SparkEntry.queries("sql_recursive_cte")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val days = rows.map(_._1)
    // dense: every day between min and max appears exactly once
    assert(days.toSeq == (days.min to days.max).toSeq)
    // totals reconcile with the raw feed
    assert(rows.map(_._2).sum ==
      Tables.events(spark, sfDir).count())
    // zero-filled days are possible but real fixture months have
    // events every day — at least assert non-negative counts
    assert(rows.forall(_._2 >= 0))
  }
}
