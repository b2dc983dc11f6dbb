package graft

import org.apache.spark.sql.functions._

/** Custom TypedImperativeAggregate verification: the per-group MinHash
  * sketch must estimate exact distinct-set Jaccard within sampling
  * error, and the merge/serialize path must make the sketch invariant
  * to how rows are partitioned.
  */
class MinHashSketchSpec extends SparkSpecBase {

  private def toks(): Map[String, Set[String]] =
    Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getString(1).split(" ")).toSet
      }

  test("position-agreement estimate tracks exact Jaccard (k=64)") {
    val exact = toks()
    val got = SparkEntry.queries("source_minhash_sim")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, agree) =>
      val (sa, sb) = (exact(a), exact(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val est = agree.toDouble / 64
      assert(math.abs(est - j) <= 0.25,
        f"($a,$b): est $est%.3f vs exact $j%.3f")
    }
  }

  test("sketch is invariant to input partitioning (merge correctness)") {
    def sketches(parts: Int) =
      Tables.documents(spark, sfDir)
        .repartition(parts, col("doc_id"))
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"))
        .agg(graft.functions.MinHashSketchAgg.sketch(col("tok")).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sketches(2) == sketches(11))
  }

  test("identical inputs give identical sketches; disjoint differ") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("t", StringType)))
    val rows = (Seq("x", "y").flatMap(g =>
      Seq("aa", "bb", "cc").map(t => org.apache.spark.sql.Row(g, t))) ++
      Seq("dd", "ee", "ff").map(t => org.apache.spark.sql.Row("z", t))).asJava
    val sk = spark.createDataFrame(rows, schema)
      .groupBy(col("g"))
      .agg(graft.functions.MinHashSketchAgg.sketch(col("t")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sk("x") == sk("y"))   // same token set -> same sketch
    assert(sk("x") != sk("z"))   // disjoint sets -> different sketch
  }
}
