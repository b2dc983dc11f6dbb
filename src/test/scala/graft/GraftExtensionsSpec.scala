package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function registration path: a session built with
  * `GraftExtensions` must expose the custom codegen expressions to SQL
  * text with the same results as their DataFrame spellings.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var savedDefault: Option[SparkSession] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    // extensions apply only at session CREATION — getOrCreate would
    // silently return another suite's extension-less default session,
    // so detach it first (the underlying SparkContext is reused).
    // The detached session is SAVED and restored in afterAll: leaving
    // the JVM-global default pointing at THIS suite's local[2] /
    // 2-partition extension session (or cleared entirely) would leak
    // this suite's configuration into every later suite's
    // getOrCreate.
    savedDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    // restore the pre-suite global session so later suites see exactly
    // the state they would have without this suite in the run order
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    savedDefault.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
    super.afterAll()
  }

  test("graft_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_sorted_intersect_count is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L, 3L, 5L, 7L), " +
        "array(3L, 4L, 5L)) AS n")
      .head().getLong(0)
    assert(r == 2L)
  }

  test("graft_minhash_sig matches the DataFrame spelling") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(array(xxhash64('a'), xxhash64('b')), 4) AS s")
      .head().getSeq[Long](0)
    val viaDf = spark.range(1)
      .select(graft.functions.MinHashSigExpr.sig(
        expr("array(xxhash64('a'), xxhash64('b'))"), 4).as("s"))
      .head().getSeq[Long](0)
    assert(viaSql == viaDf)
    assert(viaSql.length == 4)
  }

  test("graft_minhash_sig rejects a non-literal k") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L), cast(id AS INT)) " +
        "FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("graft_minhash_sig accepts a BIGINT literal k") {
    val r = spark.sql("SELECT graft_minhash_sig(array(1L, 2L), 4L) AS s")
      .head().getSeq[Long](0)
    assert(r.length == 4)
  }

  test("wrong arity fails with an argument-count error, not an index error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("graft_minhash_sketch aggregate matches the DataFrame spelling") {
    import org.apache.spark.sql.functions._
    spark.createDataFrame(Seq((1L, "x"), (1L, "y"), (2L, "x")))
      .toDF("g", "t").createOrReplaceTempView("mh_in")
    val viaSql = spark.sql(
      "SELECT g, graft_minhash_sketch(t) AS s FROM mh_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaDf = spark.table("mh_in").groupBy(col("g"))
      .agg(graft.functions.MinHashSketchAgg.sketch(col("t")).as("s"))
      .orderBy(col("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaSql.toSeq == viaDf.toSeq)
    assert(viaSql.head._2.length == 64)
  }

  test("graft_simhash_bands aggregate matches the DataFrame spelling") {
    import org.apache.spark.sql.functions._
    spark.createDataFrame(Seq((1L, 7L), (1L, -3L), (2L, 7L)))
      .toDF("g", "h").createOrReplaceTempView("sh_in")
    val viaSql = spark.sql(
      "SELECT g, graft_simhash_bands(h) AS b FROM sh_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaDf = spark.table("sh_in").groupBy(col("g"))
      .agg(graft.functions.SimHashAgg.bands(col("h")).as("b"))
      .orderBy(col("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaSql.toSeq == viaDf.toSeq)
    assert(viaSql.head._2.length == 4)
  }

  test("graft_misra_gries aggregate yields the candidate set from SQL") {
    // 'a' x4, 'b' x2, 'c' x1 with k=2: the two heavy items must be
    // tracked (MG guarantee: count > N/(k+1) = 7/3 keeps 'a'; 'b' may
    // or may not survive; 'c' never displaces 'a')
    val cands = spark.sql(
      "SELECT graft_misra_gries(t, 2) AS c FROM (SELECT explode(split(" +
        "'a a a a b b c', ' ')) AS t)")
      .head().getSeq[String](0)
    assert(cands.contains("a"))
    assert(cands.length <= 2)
    assert(cands == cands.sorted)
  }
}
