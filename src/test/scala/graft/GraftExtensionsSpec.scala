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
}
