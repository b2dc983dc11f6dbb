package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Conf-registered listener (`spark.sql.streaming.streamingQueryListeners`
  * — the only registration that reaches CHILD sessions' query managers,
  * which is where the replays run). Prints each micro-batch's
  * durationMs breakdown.
  */
class ProbeListener extends StreamingQueryListener {
  import StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit =
    println(s"PROBE start ${e.name} ${System.currentTimeMillis()}")
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    println(s"PROBE progress ${e.progress.name} batch=${e.progress.batchId} " +
      s"rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs}")
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    println(s"PROBE end ${System.currentTimeMillis()}")
}

/** Dev probe (r11): run named stream queries and dump every micro-batch
  * progress durationMs map — the breakdown (addBatch / walCommit /
  * commitOffsets / getBatch / latestOffset / queryPlanning /
  * triggerExecution) that says WHERE a replay's fixed cost lives.
  * Measurement tool only; not part of the driver surface.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.ProbeListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE total $name ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
    }
    spark.stop()
  }
}
