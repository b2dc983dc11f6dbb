package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe (r15): run named queries under the Bench session shape and
  * print per-stage task counts + bytes, to see where a query's task
  * volume actually goes (the r14 driver leg's skew-pair spikes were
  * attributed to reducer-task explosion — this measures instead of
  * guessing). Usage: runMain graft.TaskProbe <query...>
  */
object TaskProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    @volatile var stages = List.empty[(Int, Int, Long, Long, Long)]
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages ::= ((si.stageId, si.numTasks,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    }
    args.foreach { name =>
      stages = Nil
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      Thread.sleep(300) // listener bus drain
      println(f"TASKPROBE $name $dt%.3f s rows=$n stages=${stages.size} tasks=${stages.map(_._2).sum}")
      stages.sortBy(_._1).foreach { case (id, nt, rt, sr, sw) =>
        println(f"  stage=$id%5d tasks=$nt%5d runMs=$rt%7d shufRead=$sr%9d shufWrite=$sw%9d")
      }
    }
    spark.stop()
  }
}
