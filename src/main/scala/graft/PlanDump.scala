package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev/audit main (r14 optimization round): dump `explain("formatted")`
  * for NAMED queries to individual files — the before/after plan
  * evidence the optimization deliverable commits under plans/r14/.
  *
  *   runMain graft.PlanDump <outDir> <tag> <query...>
  *
  * writes <outDir>/<query>_<tag>.txt per query. Same session shape as
  * graft.Plans (local[4], 4 shuffle partitions, sf0.001 default) so the
  * dumped plans are directly diffable against PLANS.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump outDir tag query...")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val body =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch {
          case scala.util.control.NonFatal(e) =>
            s"PLANFAIL: ${e.getClass.getName}: ${e.getMessage}\n"
        }
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), body)
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
