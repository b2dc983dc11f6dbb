package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline generator for larger-scale fixtures (r5 VERDICT item 4:
  * one more decade of scale evidence). Scales a driver-generated
  * fixture directory by an integer factor via deterministic
  * replication with key remapping — no RNG, so the output is stable
  * across runs — and writes the result OUTSIDE the repo (default
  * /tmp/sf1), leaving the driver's read-only testdata untouched.
  *
  *   runMain graft.ScaleFixtures [srcDir] [dstDir] [copies]
  *
  * Replication rules (copy index cp ∈ [0, copies)):
  *  - region/nation: fixed dimensions, copied as-is;
  *  - customer/supplier/part/orders/lineitem: every key column is
  *    offset by cp × (max(key)+1) CONSISTENTLY across tables, so
  *    referential integrity (orders→customer, lineitem→orders/part/
  *    supplier) holds within every copy and keys never collide
  *    across copies;
  *  - events: event_id offset; user_id/ts kept — the user-id space is
  *    bounded by design (the realistic shape for device/user keys),
  *    so every user's history grows 10×: exactly the hot-key stress
  *    the per-key operators must absorb at scale;
  *  - documents: doc_id offset; for cp > 0 every word gets a "_cp"
  *    suffix (n_chars recomputed). This is deliberate: plain text
  *    copies would put 10 exact/near duplicates of every document in
  *    one blocking bucket and inflate candidate-PAIR volume ×copies²
  *    — a 10× corpus in the wild adds new documents instead, keeping
  *    dup-group sizes flat. Suffixed copies share ~zero grams across
  *    copies while preserving each copy's internal dup structure, so
  *    near-dup cost scales the way a real corpus does;
  *  - embeddings: vec_id offset; the vector is cyclically shifted by
  *    cp positions — same norm, same component distribution, no
  *    engineered cross-copy cosine similarity.
  */
object ScaleFixtures {

  private def withCopies(df: DataFrame, copies: Int): DataFrame =
    df.withColumn("cp", explode(sequence(lit(0L), lit(copies - 1L))))

  /** max(key)+1 — the per-copy offset stride for one key space. */
  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getAs[Number](0).longValue() + 1L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      println(s"[scale] $name -> $dst/$name.parquet")
    }

    // fixed dims: copy as-is
    write("region", t("region"), 1)
    write("nation", t("nation"), 1)

    val cS = stride(t("customer"), "c_custkey")
    val sS = stride(t("supplier"), "s_suppkey")
    val pS = stride(t("part"), "p_partkey")
    val oS = stride(t("orders"), "o_orderkey")
    val eS = stride(t("events"), "event_id")
    val dS = stride(t("documents"), "doc_id")
    val vS = stride(t("embeddings"), "vec_id")

    def off(c: String, s: Long) = (col(c) + col("cp") * s).as(c)

    write("customer", withCopies(t("customer"), copies)
      .select(off("c_custkey", cS), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment")), 2)
    write("supplier", withCopies(t("supplier"), copies)
      .select(off("s_suppkey", sS), col("s_name"), col("s_nationkey"),
        col("s_acctbal")), 2)
    write("part", withCopies(t("part"), copies)
      .select(off("p_partkey", pS), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")), 2)
    write("orders", withCopies(t("orders"), copies)
      .select(off("o_orderkey", oS), off("o_custkey", cS),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), 4)
    write("lineitem", withCopies(t("lineitem"), copies)
      .select(off("l_orderkey", oS), col("l_linenumber"),
        off("l_partkey", pS), off("l_suppkey", sS), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), 8)
    write("events", withCopies(t("events"), copies)
      .select(off("event_id", eS), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props")), 8)
    write("documents", withCopies(t("documents"), copies)
      .withColumn("text2",
        when(col("cp") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("cp"))), " ")))
      .select(off("doc_id", dS), col("text2").as("text"), col("lang"),
        col("source"), length(col("text2")).cast("long").as("n_chars")), 4)
    write("embeddings", withCopies(t("embeddings"), copies)
      .withColumn("dim", size(col("embedding")))
      .withColumn("sh", (col("cp") % col("dim")).cast("int"))
      .select(off("vec_id", vS),
        concat(
          slice(col("embedding"), col("sh") + 1, col("dim") - col("sh")),
          slice(col("embedding"), lit(1), col("sh")))
          .as("embedding"),
        col("label")), 4)

    println(s"[scale] done: $copies copies of $src at $dst")
    spark.stop()
  }
}
