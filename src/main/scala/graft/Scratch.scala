package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // simhash candidate volume
    val sigs = Tables.documents(spark, d)
      .withColumn("hs", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .withColumn("bits", expr(
        """transform(sequence(0, 63), b ->
          |  CASE WHEN aggregate(hs, 0L,
          |    (acc, h) -> acc + CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END) >= 0L
          |  THEN 1L ELSE 0L END)""".stripMargin))
      .withColumn("b0", expr("aggregate(slice(bits, 1, 16), 0L, (acc, b) -> acc * 2 + b)"))
    t("simhash sig only")(sigs.select("doc_id").count())
    val bands = sigs.select(col("doc_id"), posexplode(expr(
      """array(aggregate(slice(bits, 1, 16), 0L, (acc, b) -> acc * 2 + b),
        |      aggregate(slice(bits, 17, 16), 0L, (acc, b) -> acc * 2 + b),
        |      aggregate(slice(bits, 33, 16), 0L, (acc, b) -> acc * 2 + b),
        |      aggregate(slice(bits, 49, 16), 0L, (acc, b) -> acc * 2 + b))""".stripMargin))
      .as(Seq("band", "bv")))
    t("simhash bucket stats") {
      bands.groupBy("band", "bv").agg(count(lit(1)).as("n"))
        .agg(max("n"), sum(expr("n * (n - 1) / 2"))).show(false)
    }
    // ngram candidate volume
    val g = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), expr("n_chars div 16").as("bkt"))
    t("ngram pair count") {
      g.groupBy("lang", "bkt").agg(count(lit(1)).as("n"))
        .agg(max("n"), sum(expr("n * (n - 1) / 2"))).show(false)
    }
    // embedding band volume
    val eb = Tables.embeddings(spark, d).count()
    println(s"emb rows $eb")
    spark.stop()
  }
}
