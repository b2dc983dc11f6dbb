package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesQueries

/** `ts_funnel_steps` semantics pinned against a plain sequential
  * recomputation: for each user, walk their events in time order and
  * advance a step cursor on view → click → purchase. The operator's
  * chained conditional-min formulation must count exactly the users a
  * stateful one-pass scan counts — including the ordering trap (a
  * click BEFORE the first view must not advance the funnel).
  */
class FunnelSpec extends SparkSpecBase {

  test("funnel counts match a sequential per-user walk") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val steps = Seq("view", "click", "purchase")
    val reached = scala.collection.mutable.Map.empty[Int, Long]
    evs.groupBy(_._1).foreach { case (_, rows) =>
      var k = 0
      // strict > on the anchor: same-µs events cannot advance twice;
      // sort by ts then type is irrelevant because anchors use min-ts
      var anchor = Long.MinValue
      rows.sortBy(_._3).foreach { case (_, t, ts) =>
        if (k < 3 && t == steps(k) && ts > anchor) { k += 1; anchor = ts }
      }
      (1 to k).foreach(i => reached(i) = reached.getOrElse(i, 0L) + 1L)
    }
    val expected = (1 to 3).map(i => (i.toLong, reached.getOrElse(i, 0L)))
    val got = TimeSeriesQueries.queries("ts_funnel_steps")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got == expected)
  }

  test("funnel step counts are monotone non-increasing") {
    val ns = TimeSeriesQueries.queries("ts_funnel_steps")(spark, sfDir)
      .collect().map(_.getLong(1))
    assert(ns.length == 3 && ns(0) >= ns(1) && ns(1) >= ns(2))
    assert(ns(0) > 0)
  }
}
