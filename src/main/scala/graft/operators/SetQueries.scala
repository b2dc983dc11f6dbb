package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.G — set operations and deduplication.
  *
  * Scale notes (100 TB): UNION ALL is metadata-only (no shuffle);
  * distinct set ops shuffle once on the full row. `dedup_distinct`
  * deliberately uses groupBy+min instead of dropDuplicates: the survivor
  * is deterministic and the physical plan is the same single shuffle.
  */
object SetQueries {

  // Two overlapping order subsets so bag vs set semantics differ.
  private def urgentish(s: org.apache.spark.sql.SparkSession, d: String) =
    orders(s, d).filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
  private def pricey(s: org.apache.spark.sql.SparkSession, d: String) =
    orders(s, d).filter(col("o_totalprice") > 50000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))

  val queries: Map[String, Q] = Map(
    "set_union_all" -> ((s, d) =>
      urgentish(s, d).unionByName(pricey(s, d))
        .orderBy(col("o_orderkey"), col("o_orderpriority"))),

    "set_union_distinct" -> ((s, d) =>
      urgentish(s, d).union(pricey(s, d)).distinct()
        .orderBy(col("o_orderkey"), col("o_orderpriority"))),

    "set_intersect" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val b = customer(s, d).filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }),

    // Customers who never placed an URGENT order. (Subtracting ALL
    // order-placing customers would be vacuously empty at every
    // fixture scale — every customer has orders; the urgent subset
    // leaves a real remainder: 18 rows at sf0.001, 203 at sf0.01.)
    "set_except" -> ((s, d) => {
      val all = customer(s, d).select(col("c_custkey"))
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      all.except(urgent).orderBy(col("c_custkey"))
    }),

    // BAG-semantics set ops (r8): INTERSECT ALL / EXCEPT ALL preserve
    // MULTIPLICITY — min(m, n) copies survive an intersect, max(0,
    // m − n) an except — where the distinct forms above collapse to
    // one. The two overlapping order subsets carry real duplicates on
    // the (priority) projection, so bag and set answers genuinely
    // differ. Same single full-row shuffle as the distinct forms
    // (Spark plans both through one aggregate counting per-side
    // multiplicities).
    "set_intersect_all" -> ((s, d) =>
      urgentish(s, d).select(col("o_orderpriority"))
        .intersectAll(pricey(s, d).select(col("o_orderpriority")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("o_orderpriority"))),

    "set_except_all" -> ((s, d) =>
      urgentish(s, d).select(col("o_orderpriority"))
        .exceptAll(pricey(s, d).select(col("o_orderpriority")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("o_orderpriority"))),

    // Deterministic-survivor dedup (SURVEY.md §5.3.5): groupBy + min
    // instead of dropDuplicates.
    "dedup_distinct" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("first_event"),
          min(col("ts_us")).as("first_ts_us"))
        .orderBy(col("user_id"), col("event_type"))),

    // Symmetric difference (r9): keys in exactly ONE of the two sets
    // (AUTOMOBILE-segment customers vs urgent-order customers), tagged
    // with the side that holds them. Spelled as the two anti
    // directions union'd — each EXCEPT is a shuffled left-anti on the
    // key, so both sides stream and nothing is collected; the tag
    // makes the result strictly richer than EXCEPT UNION EXCEPT
    // without a second pass.
    "set_symmetric_diff" -> ((s, d) => {
      val a = customer(s, d)
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
      val b = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")).distinct()
      a.except(b).withColumn("side", lit("auto_only"))
        .unionByName(b.except(a).withColumn("side", lit("urgent_only")))
        .orderBy(col("custkey"), col("side"))
    })
  )

  val oracle: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 50000.0
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |UNION
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 50000.0
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,
    "set_intersect_all" ->
      """WITH i AS (
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 50000.0
        |)
        |SELECT o_orderpriority, count(*) AS n_copies
        |FROM i GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "set_except_all" ->
      """WITH x AS (
        |  SELECT o_orderpriority FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 50000.0
        |)
        |SELECT o_orderpriority, count(*) AS n_copies
        |FROM x GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "dedup_distinct" ->
      """SELECT user_id, event_type, min(event_id) AS first_event,
        |  min(epoch_us(ts)) AS first_ts_us
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "set_symmetric_diff" ->
      """WITH a AS (
        |  SELECT c_custkey AS custkey FROM customer
        |  WHERE c_mktsegment = 'AUTOMOBILE'
        |), b AS (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT custkey, 'auto_only' AS side FROM (
        |  SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
        |UNION ALL
        |SELECT custkey, 'urgent_only' FROM (
        |  SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
        |ORDER BY custkey, side""".stripMargin
  )
}
