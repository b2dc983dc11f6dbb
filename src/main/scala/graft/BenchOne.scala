package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: time a named subset of SparkEntry.queries (all args are
  * query names; no args = list keys). Same session conf as Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // defaults and confs MUST track Bench exactly — the tool exists to
    // reproduce driver bench numbers (r7 review: a 32-cpu default and
    // a missing broadcastTimeout made its times incomparable)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (args.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    // same partition-sensitivity knob as Bench (r11) — the tool must
    // reproduce BOTH bench legs
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen path once so timings are comparable
    // (same guarded call as Bench: a missing sf0.001 fixture should
    // not kill the run before any requested query is timed). NonFatal
    // only — swallowing an OutOfMemoryError here would surface as a
    // confusing failure on the first timed query instead (r7 ADVICE)
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"BENCHONE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
