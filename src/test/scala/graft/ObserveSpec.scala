package graft

import org.apache.spark.sql.functions._

/** `profile_observe` second opinion: the CollectMetrics side-channel
  * must yield exactly what a dedicated aggregate scan computes.
  */
class ObserveSpec extends SparkSpecBase {

  test("profile_observe metrics equal a dedicated aggregate scan") {
    val got = SparkEntry.queries("profile_observe")(spark, sfDir)
      .collect()(0)
    val exp = Tables.lineitem(spark, sfDir).agg(
      count(lit(1)),
      count(col("l_returnflag")),
      min(col("l_orderkey")),
      max(col("l_orderkey")),
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .collect()(0)
    (0 until 5).foreach(i =>
      assert(got.get(i) == exp.get(i), s"metric $i"))
  }

  test("observation re-runs are independent (fresh Observation per call)") {
    val a = SparkEntry.queries("profile_observe")(spark, sfDir).collect()(0)
    val b = SparkEntry.queries("profile_observe")(spark, sfDir).collect()(0)
    assert(a == b)
  }
}
