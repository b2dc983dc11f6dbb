package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.B — projections, filters, predicates.
  *
  * Football reading: select match columns, filter by season/team
  * (derived surface; the reference snapshot has no code —
  * `/root/reference/README.md:1-2`).
  */
object FilterQueries {

  val queries: Map[String, Q] = Map(
    // Projection + rename + computed decimal column. Filter pushdown /
    // column pruning asserted in PlanShapeSpec.
    "project_select" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber").as("line_no"),
          // exact decimal product, double output surface (see
          // Tables.moneySumD for why decimal outputs can't hash-match)
          revenue(col("l_extendedprice"), col("l_discount"))
            .cast(DoubleType).as("revenue"))
        // lineitem has no unique key (FIXTURES) — order by every output
        // column so duplicate (orderkey, linenumber) rows sort stably.
        .orderBy(col("l_orderkey"), col("line_no"), col("revenue"))),

    // <, <=, >, >=, <> over numeric and timestamp columns.
    "filter_comparison" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") > 30.0)
        .filter(col("l_tax") <= 0.05)
        .filter(col("l_returnflag") =!= "A")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // IN list + BETWEEN on dates.
    "filter_in_between" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast(TimestampType),
          lit("1996-12-31").cast(TimestampType)))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    // LIKE prefix and infix patterns.
    "filter_like" -> ((s, d) =>
      part(s, d)
        .filter(col("p_type").like("PROMO%") || col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))),

    // IS [NOT] NULL + three-valued AND/OR/NOT (nulls introduced with
    // nullif so the fixture's non-null columns still exercise the path).
    "filter_null_bool" -> ((s, d) => {
      val c = customer(s, d)
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      c.filter(
        (col("seg").isNull && col("c_acctbal") > 0.0) ||
          (col("seg").isNotNull && !(col("c_acctbal") > 5000.0)))
        .select(col("c_custkey"), col("seg"))
        .orderBy(col("c_custkey"))
    }),

    // Multi-branch conditional projection.
    "project_case_when" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", 1)
            .when(col("o_orderpriority") === "2-HIGH", 2)
            .otherwise(3).as("prio_class"))
        .orderBy(col("o_orderkey"))),

    // Cast matrix: long->int, long->string, double->decimal,
    // timestamp->date, long->double. (double->int is deliberately
    // excluded: Spark truncates, DuckDB rounds — not portable.)
    "project_cast" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast(IntegerType).as("okey_int"),
          col("o_custkey").cast(StringType).as("ckey_str"),
          // double->decimal cast is the showcased op; surface it as the
          // decimal's string rendering ("205941.60"), which both engines
          // produce identically — a raw decimal output can't hash-match
          // (Tables.moneySumD).
          money(col("o_totalprice")).cast(StringType).as("price_dec"),
          col("o_orderdate").cast(DateType).as("odate"),
          col("o_orderkey").cast(DoubleType).as("okey_dbl"))
        .orderBy(col("o_orderkey")))
  )

  val oracle: Map[String, String] = Map(
    "project_select" ->
      """SELECT l_orderkey, l_linenumber AS line_no,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, line_no, revenue""".stripMargin,
    "filter_comparison" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30.0 AND l_tax <= 0.05 AND l_returnflag <> 'A'
        |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "filter_in_between" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%red%'
        |ORDER BY p_partkey""".stripMargin,
    "filter_null_bool" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer
        |WHERE (nullif(c_mktsegment, 'BUILDING') IS NULL AND c_acctbal > 0.0)
        |   OR (nullif(c_mktsegment, 'BUILDING') IS NOT NULL AND NOT (c_acctbal > 5000.0))
        |ORDER BY c_custkey""".stripMargin,
    "project_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |       WHEN o_orderpriority = '2-HIGH' THEN 2
        |       ELSE 3 END AS prio_class
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "project_cast" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS INTEGER) AS okey_int,
        |  CAST(o_custkey AS VARCHAR) AS ckey_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(o_orderkey AS DOUBLE) AS okey_dbl
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
