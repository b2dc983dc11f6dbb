package graft.functions

import graft.Tables._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.J — UDF / UDAF / UDTF surface.
  *
  * The scalar UDF is deliberately the ONLY place the engine drops out of
  * Catalyst expressions (documented pushdown loss — the equivalent CASE
  * expression in §2.B stays codegen'd). The UDAF is a typed Aggregator
  * with an exact-decimal buffer so the result is reproducible across
  * partition orderings — summation order cannot change the answer,
  * which is what makes it safe at 1000-executor scale.
  */
object UdfQueries {

  /** Quantity-weighted average price: exact BigDecimal sums in the
    * buffer (merge-order independent), IEEE double division at finish.
    */
  val weightedAvg: Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] =
    new Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
      private def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
      def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
        (b._1 + d2(a._1) * d2(a._2), b._2 + d2(a._2))
      def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (BigDecimal, BigDecimal)): Double =
        if (b._2.signum == 0) 0.0 else b._1.toDouble / b._2.toDouble
      def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
        Encoders.product[(BigDecimal, BigDecimal)]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val queries: Map[String, Q] = Map(
    // Scala scalar UDF used in both select and filter. Boxed argument:
    // a primitive Double makes Spark skip the call on NULL input and
    // emit NULL (row dropped by the filter), while the oracle's CASE
    // falls through to ELSE 'HIGH' and keeps the row — latent on the
    // non-null fixture, a ROWS mismatch the day discounts go nullable
    // (r7 review). NULL -> 'HIGH' matches the CASE exactly.
    "udf_scalar" -> ((s, d) => {
      val band = udf((disc: java.lang.Double) =>
        if (disc == null) "HIGH"
        else if (disc < 0.03) "LOW"
        else if (disc < 0.07) "MID" else "HIGH")
      lineitem(s, d)
        .withColumn("band", band(col("l_discount")))
        .filter(col("band") =!= "LOW")
        .select(col("l_orderkey"), col("l_linenumber"), col("band"))
        // lineitem (orderkey, linenumber) is non-unique — include band.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("band"))
    }),

    // Typed UDAF: quantity-weighted average extended price per flag.
    "udaf_weighted_avg" -> ((s, d) => {
      val wavg = udaf(weightedAvg)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Generator with position (posexplode).
    "udtf_posexplode" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "token")))
        .orderBy(col("p_partkey"), col("pos")))
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount < 0.03 THEN 'LOW'
        |       WHEN l_discount < 0.07 THEN 'MID' ELSE 'HIGH' END AS band
        |FROM lineitem
        |WHERE (CASE WHEN l_discount < 0.03 THEN 'LOW'
        |       WHEN l_discount < 0.07 THEN 'MID' ELSE 'HIGH' END) <> 'LOW'
        |ORDER BY l_orderkey, l_linenumber, band""".stripMargin,
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_posexplode" ->
      """SELECT p_partkey, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS token
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS l FROM part) t
        |ORDER BY p_partkey, pos""".stripMargin
  )
}
