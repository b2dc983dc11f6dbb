package graft
import org.apache.spark.sql.SparkSession

/** Scale-slope sweep that survives box weather (r14, VERDICT task 4).
  *
  * The naive methodology — one full leg per scale, slopes =
  * leg_B / leg_A — breaks on a shared box: the r13 sf1 sweep leg ran
  * at 6.1% steal and the r14 attempt hit burst-IOPS exhaustion that
  * inflated I/O-heavy queries 20-40× while CPU-bound ones ran at quiet
  * speed IN THE SAME LEG. A slope computed across legs measured hours
  * apart is then weather, not shape.
  *
  * This tool times each query at BOTH scales back-to-back in one JVM
  * (A then B, per query), so the pair shares its weather window and
  * the ratio cancels what the box does to both sides — the same
  * structure as StreamFloorSpec's stateful/stateless in-JVM ratio
  * gate. A fixed-work spin (Bench's calibration loop, shortened) runs
  * between pairs and is printed per pair, so a pair that DID straddle
  * a weather edge is identifiable instead of silently poisoning the
  * slope. Two passes: pass 1 warms code paths and builds each input's
  * writeOnce artifacts (timed but not the record); pass 2 is the
  * measurement.
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.ScaleSweep dirA dirB q1 q2 ...
  *
  * Output, one line per (pass, query):
  *   SWEEP pass=P q=NAME a=SECS b=SECS ratio=R spin=NS rowsA=N rowsB=N
  */
object ScaleSweep {

  /** Bench's calibration loop at 1/4 length (~0.1-0.25 s quiet) —
    * enough to read the instant's effective CPU speed between pairs. */
  private def spinNsPerOp(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val n = 100000000L
    val t0 = System.nanoTime()
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val dt = System.nanoTime() - t0
    if (x == 42L) System.err.println("calib")
    dt.toDouble / n
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleSweep dirA dirB query...")
    val (dirA, dirB) = (args(0), args(1))
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same conf surface as Bench/BenchOne — the numbers must be
    // comparable to the committed legs
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a shared box can freeze for >10 s mid-shuffle (hypervisor
      // throttle waves, GC of a 60 M-row build side); the default 10 s
      // heartbeat then kills the in-process executor and fails the leg
      // spuriously — seen live on the first r14 sf10 attempt
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "800s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    for (pass <- 1 to 2; name <- names) {
      val fn = SparkEntry.queries(name)
      def one(dir: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = try fn(spark, dir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"FAIL $name @ $dir: ${e.getMessage}"); -1L }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (ta, na) = one(dirA)
      val (tb, nb) = one(dirB)
      val spin = spinNsPerOp()
      println(f"SWEEP pass=$pass q=$name%-28s a=$ta%9.3f b=$tb%9.3f " +
        f"ratio=${tb / ta}%6.2f spin=$spin%5.2f rowsA=$na rowsB=$nb")
    }
    spark.stop()
  }
}
