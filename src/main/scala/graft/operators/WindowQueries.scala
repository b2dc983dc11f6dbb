package graft.operators

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.E/§2.F — window functions, top-k per group, sorts,
  * global top-k.
  *
  * Football reading: standings rank, player form (moving average),
  * streaks via lag, top scorers (derived surface —
  * `/root/reference/README.md:2`).
  *
  * Scale notes (100 TB): every window partitions on a key
  * (single shuffle, per-partition sort); no global-order window exists
  * here. The global top-k compiles to TakeOrderedAndProject (per
  * partition heap + driver merge), never a full sort.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    "win_row_number" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          row_number().over(w).as("rn"))
        .orderBy(col("c_custkey"))
    }),

    // rank/dense_rank with genuine ties (nationkey within segment).
    "win_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_nationkey").asc)
      customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy(col("c_custkey"))
    }),

    // Previous/next order date per customer (gap analysis).
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w).as("prev_date"),
          lead(col("o_orderdate"), 1).over(w).as("next_date"))
        .orderBy(col("o_orderkey"))
    }),

    // Running revenue per customer.
    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          sum(money(col("o_totalprice"))).over(w)
            .cast(DoubleType).as("run_spend"))
        .orderBy(col("o_orderkey"))
    }),

    // 3-row moving average (player-form shape); exact decimal sum /
    // window count for cross-engine determinism. The fixture's lineitem
    // has NO unique key (duplicate (orderkey,linenumber,suppkey) rows
    // exist), so the window sort includes the measure columns: rows that
    // remain tied are identical in l_quantity, making every admissible
    // frame produce the same sum. Output ordered by all columns for the
    // same reason.
    "win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_quantity").asc,
          col("l_extendedprice").asc)
        .rowsBetween(-2, Window.currentRow)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (sum(money(col("l_quantity"))).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("mov_avg_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("mov_avg_qty"))
    }),

    // Value-range frame: trailing 30 days per customer over epoch-day.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("od_day"))
        .rangeBetween(-30, Window.currentRow)
      orders(s, d)
        .withColumn("od_day", unix_date(col("o_orderdate").cast(DateType)))
        .select(col("o_orderkey"),
          count(lit(1)).over(w).as("n_30d"),
          sum(money(col("o_totalprice"))).over(w)
            .cast(DoubleType).as("spend_30d"))
        .orderBy(col("o_orderkey"))
    }),

    // ntile / percent_rank / cume_dist.
    "win_ntile_pct" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("c_custkey"))
    }),

    // first/last/nth value over an explicitly-framed window (frame must
    // be full-partition for last/nth to be deterministic).
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      customer(s, d)
        .select(col("c_custkey"),
          first(col("c_custkey")).over(w).as("seg_top"),
          last(col("c_custkey")).over(w).as("seg_bottom"),
          nth_value(col("c_custkey"), 2).over(w).as("seg_second"))
        .orderBy(col("c_custkey"))
    }),

    // Top-3 orders per customer (top-scorers shape).
    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice").as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Multi-key sort with explicit null placement (nulls via nullif).
    "sort_multi_key" -> ((s, d) =>
      customer(s, d)
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .select(col("c_custkey"), col("seg"), col("c_acctbal"))
        .orderBy(asc_nulls_last("seg"), col("c_acctbal").desc,
          col("c_custkey").asc)),

    // Global top-20 (TakeOrderedAndProject — asserted in PlanShapeSpec).
    "sort_limit_topk" -> ((s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        // raw double price: a decimal output would hash-mismatch on
        // rendering (Tables.moneySumD); r2 passed only because the
        // top-20 happened to avoid trailing-zero cents.
        .select(col("o_orderkey"), col("o_totalprice").as("price")))
  )

  val oracle: Map[String, String] = Map(
    "win_row_number" ->
      """SELECT c_custkey, c_nationkey,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_rank_dense" ->
      """SELECT c_custkey, c_mktsegment, c_nationkey,
        |  rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS rnk,
        |  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC) AS drnk
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_date,
        |  lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_running_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_moving_avg" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS mov_avg_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC, l_extendedprice ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, mov_avg_qty""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey,
        |  count(*) OVER w AS n_30d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS od_day FROM orders) t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY od_day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "win_ntile_pct" ->
      """SELECT c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "win_first_last" ->
      """SELECT c_custkey,
        |  first_value(c_custkey) OVER w AS seg_top,
        |  last_value(c_custkey) OVER w AS seg_bottom,
        |  nth_value(c_custkey, 2) OVER w AS seg_second
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "sort_multi_key" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS LAST, c_acctbal DESC, c_custkey ASC""".stripMargin,
    "sort_limit_topk" ->
      """SELECT o_orderkey, o_totalprice AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin
  )
}
