package graft

import org.apache.spark.sql.functions._

/** stream_tws_timers: output must be produced by the WATERMARK firing
  * inactivity timers — exactly the users whose last activity is >=
  * 30 min before the final watermark, each with complete totals, and
  * users active near stream end withheld (their timer never fires).
  */
class TimerCloseSpec extends SparkSpecBase {

  test("timer emissions are the complete totals of exactly the inactive users") {
    val got = SparkEntry.queries("stream_tws_timers")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val wmMs = ev.map(_._2).max / 1000 - 600000
    val byUser = ev.groupBy(_._1)
    val want = byUser.collect {
      case (u, rows) if rows.map(_._2).max / 1000 + 1800000 <= wmMs =>
        u -> (rows.length.toLong,
          rows.map(r => math.round(r._3 * 100)).sum)
    }
    assert(got.nonEmpty && got == want)
    // the timer GATE must be doing something: some user is still open
    assert(got.size < byUser.size,
      "every user closed — the inactivity gate never withheld anything")
  }
}
