package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VERDICT r3 item 10 — degenerate-input depth beyond the parametric
  * smoke loop: every operator is executed against a crafted MINIMAL
  * fixture (single-row groups, an all-NULL value column, a
  * single-version SCD entity, a one-pair duplicate graph, missing IVF
  * centroids, a 4-event stream), and the streaming family additionally
  * against a fully EMPTY event feed. The fixture reuses the real
  * schemas (FIXTURES.md) so the production query functions run
  * unmodified — the point is that the operators' semantics hold at the
  * boundaries, not just at fixture scale.
  */
class EdgeCaseSpec extends SparkSpecBase {

  /** Synthetic minimal fixture directory (all 10 tables). TempDirs
    * registers the shutdown-hook delete (the raw createTempDirectory
    * mistake this repo already fixed once is documented in TempDirs).
    */
  private lazy val tinyDir: String = {
    val dir = TempDirs.scoped("edge_tiny", "fixture")
    writeTables(dir, eventRows)
    dir
  }

  /** Same fixture with an EMPTY events table. */
  private lazy val emptyEventsDir: String = {
    val dir = TempDirs.scoped("edge_noev", "fixture")
    writeTables(dir, Seq.empty)
    dir
  }

  // 2024-01-01 00:00:00 UTC in epoch NANOS (events.ts storage domain)
  private val T0 = 1704067200L * 1000000000L
  private def ns(minutes: Double): Long = T0 + (minutes * 60e9).toLong

  /** (event_id, ts_ns, user_id, event_type, value, props):
    *  - click id=1 and purchase id=2 five minutes apart, same user →
    *    exactly one stream_stream_join pair;
    *  - id=50 (the % 50 == 0 holdback) inside hour window 0 → dropped
    *    as late by stream_watermark_late;
    *  - id=3 at 70.5 min keeps every watermark strictly off the
    *    hour-boundary collision cases.
    */
  private val eventRows: Seq[(Long, Long, Long, String, Double, String)] =
    Seq(
      (1L, ns(0), 7L, "click", 10.00, """{"k": 1}"""),
      (50L, ns(1), 7L, "view", 2.50, """{"k": 2}"""),
      (2L, ns(5), 7L, "purchase", 99.99, """{"k": 3}"""),
      (3L, ns(70.5), 8L, "error", 0.25, """{"k": 4}"""))

  private def writeTables(
      dir: String,
      events: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    val s = spark
    import s.implicits._
    def save(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

    save(Seq((0, "AMERICA")).toDF("r_regionkey", "r_name"), "region")
    save((0 until 25).map(i => (i, s"NATION_$i", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")
    save(Seq((1L, "Supplier#1", 0, 100.50))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")
    // custkey 2: in the merge base (2 % 3 != 0) AND delta (2 % 2 == 0),
    // with an all-NULL value column — the null-through-MERGE edge
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    save(spark.createDataFrame(
      java.util.List.of(
        Row(2L, "Customer#2", 7, null, "BUILDING"),
        Row(4L, "Customer#4", 8, 500.25, "MACHINERY")),
      custSchema), "customer")
    save(Seq((1L, "azure metal gear", "Brand#1", "ECONOMY BRUSHED", 7, 901.00))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"), "part")
    // custkey 2: ONE order (single SCD2 version, must still close with
    // the open sentinel); custkey 4: same-day duplicate + a later one
    save(Seq(
      (1L, 2L, "O", 1000.00, Timestamp.valueOf("1995-03-15 00:00:00"), "1-URGENT"),
      (2L, 4L, "F", 2000.00, Timestamp.valueOf("1996-06-01 00:00:00"), "5-LOW"),
      (3L, 4L, "F", 3000.00, Timestamp.valueOf("1996-06-01 00:00:00"), "5-LOW"),
      (4L, 4L, "O", 4000.00, Timestamp.valueOf("1997-01-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"), "orders")
    save(Seq(
      (1L, 1L, 1L, 1, 5.0, 500.00, 0.05, 0.02, "N", "O",
        Timestamp.valueOf("1995-03-20 00:00:00")),
      (2L, 1L, 1L, 1, 3.0, 300.00, 0.00, 0.01, "A", "F",
        Timestamp.valueOf("1996-06-05 00:00:00")),
      (2L, 1L, 1L, 2, 7.0, 700.00, 0.10, 0.00, "R", "F",
        Timestamp.valueOf("1996-06-07 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"), "lineitem")
    save(events.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props"), "events")
    // docs 1 and 2 share identical text (one near-dup pair, one
    // cluster); doc 97 is the contamination bench slice (97 % 97 == 0)
    val txt = "the quick brown fox jumps over the lazy dog again"
    save(Seq(
      (1L, txt, "en", "src0", txt.length.toLong),
      (2L, txt, "en", "src1", txt.length.toLong),
      (97L, "completely different words in this unique benchmark document",
        "de", "src1", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    // vec_ids 0..5 only: the IVF centroid slice (100-115) is EMPTY
    val rnd = new scala.util.Random(7)
    save((0L to 5L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label"), "embeddings")
  }

  private def run(name: String, d: String): DataFrame =
    SparkEntry.queries(name)(spark, d)

  test("every operator completes on the minimal degenerate fixture") {
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      try { run(name, tinyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("merge_upsert: a NULL value column rides through MERGE untouched") {
    val rows = run("merge_upsert", tinyDir).collect()
    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    // custkey 2 is base ∩ delta → update; its NULL balance must stay
    // NULL (+100 on NULL is NULL) and never misclassify the op, which
    // keys off join-key presence, not value-column nullness
    assert(byKey(2L).getString(3) == "update")
    assert(byKey(2L).getString(1) == "UPDATED")
    assert(byKey(2L).isNullAt(2))
    // custkey 4: delta-only (4 % 3 != 0 puts it in base too) → update
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("scd2_intervals: a single-version entity closes with the sentinel") {
    val rows = run("scd2_intervals", tinyDir).collect()
    val c2 = rows.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2.head.getInt(5) == 1,
      "one open version expected for the single-order entity")
    // same-day duplicate orders collapse to one version per date
    val c4 = rows.filter(_.getLong(0) == 4L)
    assert(c4.length == 2, s"expected 2 versions, got ${c4.length}")
    assert(c4.count(_.getInt(5) == 1) == 1)
  }

  test("table_checksum counts the NULL-balance row like any other") {
    val r = run("table_checksum", tinyDir).head()
    assert(r.getLong(0) == 2L)
  }

  test("dedup_cc_clusters labels exactly the one planted pair") {
    val rows = run("dedup_cc_clusters", tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 1L), (2L, 1L)))
  }

  test("dedup_near_canonical keeps the min-id survivor plus singletons") {
    val ids = run("dedup_near_canonical", tinyDir).collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(1L, 97L))
  }

  test("ann_ivf_topk returns empty when the centroid slice is empty") {
    assert(run("ann_ivf_topk", tinyDir).count() == 0)
  }

  test("stream_stream_join finds exactly the one in-window pair") {
    val rows = run("stream_stream_join", tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((7L, 1L, 2L)))
  }

  test("stream_watermark_late drops the held-back row, emits closed windows") {
    // watermark after all = 70.5min - 10min → only hour-window 0 closes;
    // the held-back id=50 row's window closed in pass 1, so n = on-time
    // rows only (ids 1, 2)
    val rows = run("stream_watermark_late", tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((T0 / 1000L, 2L)))
  }

  test("ts_resample_ohlc: a single-event bar has open=high=low=close") {
    val rows = run("ts_resample_ohlc", tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    // user 7, hour 0: open = first event (10.00), close = last (99.99)
    val u7 = rows.find(_._1 == 7L).get
    assert((u7._3, u7._4, u7._5, u7._6, u7._7) ==
      ((10.00, 99.99, 2.50, 99.99, 3L)))
    // user 8's lone event: all four bar prices collapse to it
    val u8 = rows.find(_._1 == 8L).get
    assert((u8._3, u8._4, u8._5, u8._6, u8._7) ==
      ((0.25, 0.25, 0.25, 0.25, 1L)))
  }

  test("mix_temperature: data-derived rates on a 2-source micro corpus") {
    val rows = run("mix_temperature", tinyDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // src1 holds n_max (2 docs) → rate 16 → threshold 'g' keeps all
    assert(rows("src1") == ((2L, 2L)))
    // src0: rate16 = floor(16·sqrt(1/2)) = 11 → keep iff md5 first hex
    // digit < 'b' (recomputed independently here)
    val txt = "the quick brown fox jumps over the lazy dog again"
    val digit = java.security.MessageDigest.getInstance("MD5")
      .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    if (digit < 'b') assert(rows("src0") == ((1L, 1L)))
    else assert(!rows.contains("src0"))
  }

  test("text_len_trim trims degenerate groups entirely (all rows are the tail)") {
    // en: two docs with EQUAL n_chars → both percent_rank 0 → trimmed;
    // de: a single doc → percent_rank 0 → trimmed. The gate's defined
    // semantics: a group too small to have an interior has no keepers.
    assert(run("text_len_trim", tinyDir).count() == 0)
  }

  test("scan_schema_evolution reconciles pre-evolution rows to LEGACY") {
    val rows = run("scan_schema_evolution", tinyDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("LEGACY") == ((2L, 6000.0))) // even keys 2, 4
    assert(rows("1-URGENT") == ((1L, 1000.0)))
    assert(rows("5-LOW") == ((1L, 3000.0)))
    assert(rows.size == 3)
  }

  test("sql_recursive_cte: a sub-day feed yields a one-day calendar") {
    val rows = run("sql_recursive_cte", tinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 1 && rows.head._2 == 4L)
  }

  test("every streaming operator yields empty output on an empty feed") {
    val streamingOps = SparkEntry.queries.keys.filter(_.startsWith("stream_"))
    val failures = streamingOps.toSeq.sorted.flatMap { name =>
      try {
        val n = run(name, emptyEventsDir).count()
        if (n == 0) None else Some(s"$name: expected 0 rows, got $n")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
