package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Every public GraftOps entry point on a DEFAULT-configured session —
  * AQE on, shuffle.partitions=200 (the out-of-the-box values a library
  * user actually runs under), against the fixture session's results
  * (r10 verdict item 6). The r9 asof facade bug — an internal AQE-off
  * assumption that only a default session could trip — is the class
  * this suite kills permanently: GraftOpsSpec pins facade == operator
  * on the fixture session, so pinning facade(default session) ==
  * facade(fixture session) here closes the loop for every entry point.
  * (`asofJoin` itself already has a dedicated default-session test in
  * AsofJoinNativeSpec; it is repeated here so THIS suite alone covers
  * the full surface.)
  */
class GraftOpsDefaultSessionSpec extends SparkSpecBase {
  import graft.api.GraftOps

  private lazy val dflt: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "200")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s
  }

  /** Collect-and-sort both sessions' results and require equality —
    * every facade output here is either naturally ordered or
    * order-insensitive after the sort.
    */
  private def parity(tag: String)(f: SparkSession => DataFrame): Unit = {
    val a = f(spark).collect().map(_.toString).sorted.toSeq
    val b = f(dflt).collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty, s"$tag produced no rows on the fixture session")
    assert(a == b, s"$tag diverges on a default session")
  }

  private def docs(s: SparkSession) = Tables.documents(s, sfDir)

  test("hashSample parity") {
    parity("hashSample")(s => GraftOps.hashSample(docs(s), "text", 4)
      .select(col("doc_id")))
  }

  test("hashSplit parity") {
    parity("hashSplit")(s => GraftOps.hashSplit(docs(s), "text")
      .select(col("doc_id"), col("split")))
  }

  test("qualityScore parity") {
    parity("qualityScore")(s => GraftOps.qualityScore(docs(s), "text"))
  }

  test("tokenCounts parity") {
    parity("tokenCounts")(s => GraftOps.tokenCounts(docs(s), "text"))
  }

  test("packTokenBudget parity") {
    parity("packTokenBudget")(s =>
      GraftOps.packTokenBudget(docs(s), "lang", "doc_id", "text"))
  }

  test("minhashCandidatePairs parity") {
    parity("minhashCandidatePairs")(s =>
      GraftOps.minhashCandidatePairs(docs(s), "doc_id", "text"))
  }

  test("substringDupStats and substringRemove parity") {
    parity("substringDupStats")(s =>
      GraftOps.substringDupStats(docs(s), "doc_id", "text"))
    parity("substringRemove")(s =>
      GraftOps.substringRemove(docs(s), "doc_id", "text"))
  }

  test("intervalOverlapJoin parity") {
    def side(s: SparkSession, mod: Int, lenMod: Int,
             id: String, s0: String, e0: String) =
      Tables.orders(s, sfDir).filter(col("o_orderkey") % mod === 0)
        .select(col("o_orderkey").as(id),
          to_date(col("o_orderdate")).as(s0),
          date_add(to_date(col("o_orderdate")),
            (col("o_orderkey") % lenMod + 1).cast("int")).as(e0))
    parity("intervalOverlapJoin")(s =>
      GraftOps.intervalOverlapJoin(
        side(s, 97, 5, "a_id", "a_s", "a_e"), "a_s", "a_e",
        side(s, 89, 7, "b_id", "b_s", "b_e"), "b_s", "b_e")
        .select(col("a_id"), col("b_id")))
  }

  test("covarianceNumerators parity") {
    parity("covarianceNumerators")(s =>
      GraftOps.covarianceNumerators(
        Tables.embeddings(s, sfDir), "embedding", "vec_id"))
  }

  test("sampledQuantileCuts parity") {
    parity("sampledQuantileCuts")(s => {
      val scored = GraftOps.qualityScore(docs(s), "text")
        .withColumn("score", lit(20000L) - col("stop_bp") - col("short_bp"))
      GraftOps.sampledQuantileCuts(scored, "source", "score",
        "text", Seq(0.7))
        .select(col("source"), element_at(col("cuts"), 1).as("thr"))
    })
  }

  test("weightedMedian parity") {
    parity("weightedMedian")(s => {
      val li = Tables.lineitem(s, sfDir).select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
        expr("cast(cast(l_quantity as decimal(18,0)) as long)").as("w"))
      GraftOps.weightedMedian(li, "l_returnflag", "cents", "w")
    })
  }

  test("cusum parity") {
    parity("cusum")(s => {
      val ev = Tables.events(s, sfDir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      GraftOps.cusum(ev, "user_id", "cents", Seq("ts_us", "event_id"))
    })
  }

  test("lag1Autocorr parity") {
    parity("lag1Autocorr")(s => {
      val ev = Tables.events(s, sfDir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      GraftOps.lag1Autocorr(ev, "user_id", "cents", Seq("ts_us", "event_id"))
    })
  }

  test("asofJoin parity") {
    parity("asofJoin")(s => {
      val ev = Tables.events(s, sfDir)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val sg = Tables.events(s, sfDir)
        .filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user_id"),
          col("ts_us").as("last_signup_us"),
          col("event_id").as("signup_event_id"))
      GraftOps.asofJoin(s, ev, sg, "user_id", "s_user_id",
          "ts_us", "last_signup_us",
          rightTiebreak = Seq("signup_event_id"))
        .select(col("event_id"), col("last_signup_us"))
    })
  }
}
