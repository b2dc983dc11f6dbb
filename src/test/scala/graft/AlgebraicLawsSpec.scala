package graft

import org.apache.spark.sql.functions._

/** SURVEY.md §5.2.4 — property-based algebraic laws on generated
  * micro-tables (engine-level invariants that hold for ANY input, not
  * just the fixtures). Seeded generation keeps runs reproducible.
  */
class AlgebraicLawsSpec extends SparkSpecBase {

  import scala.jdk.CollectionConverters._

  private def df(rows: List[(Int, Int)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", IntegerType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  private def samples(seed: Int): Seq[List[(Int, Int)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(5)(List.fill(30)((rnd.nextInt(6), rnd.nextInt(201) - 100)))
  }

  test("union-all count additivity") {
    samples(1).zip(samples(2)).foreach { case (a, b) =>
      assert(df(a).unionByName(df(b)).count() == a.length + b.length)
    }
  }

  test("filter-join commutation (filter before == after an inner join)") {
    samples(3).zip(samples(4)).foreach { case (a, b) =>
      val l = df(a); val r = df(b).withColumnRenamed("v", "w")
      val pre = l.filter(col("v") > 0).join(r, "k").count()
      val post = l.join(r, "k").filter(col("v") > 0).count()
      assert(pre == post)
    }
  }

  test("distinct idempotence") {
    samples(5).foreach { a =>
      val d = df(a).distinct()
      assert(d.count() == d.distinct().count())
    }
  }

  test("groupBy sum equals global sum") {
    samples(6).foreach { a =>
      val grouped = df(a).groupBy(col("k"))
        .agg(sum(col("v")).as("s"))
        .agg(sum(col("s"))).collect()(0)
      val global = df(a).agg(sum(col("v"))).collect()(0)
      assert(grouped == global)
    }
  }

  test("window rank output is permutation-invariant") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("rid"))
    def ranked(rows: List[(Int, Int)]): Set[(Int, Int, Int)] =
      df(rows)
        .withColumn("rid", xxhash64(col("k"), col("v")))
        .withColumn("rn", row_number().over(w))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(3)))
        .toSet
    samples(7).foreach { a =>
      val perm = new scala.util.Random(8).shuffle(a)
      assert(ranked(a) == ranked(perm))
    }
  }

  test("dedup (groupBy min) is idempotent and keeps one row per key") {
    samples(9).foreach { a =>
      val d1 = df(a).groupBy(col("k")).agg(min(col("v")).as("v"))
      assert(d1.count() == a.map(_._1).distinct.length)
      val d2 = d1.groupBy(col("k")).agg(min(col("v")).as("v"))
      assert(d2.collect().toSet == d1.collect().toSet)
    }
  }
}
