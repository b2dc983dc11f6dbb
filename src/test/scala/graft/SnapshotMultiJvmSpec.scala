package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.SnapshotTable

/** Cross-PROCESS stress for the snapshot-commit protocol and
  * `TempDirs.durableOnce` (r11 verdict #4). `SnapshotStressSpec`
  * proves the interleavings within one JVM; this spec spawns THREE
  * real JVMs (`graft.SnapshotStressWorker`) against one table root —
  * each running appenders, a compactor and a vacuum concurrently —
  * because both mechanisms' claims are cross-process by nature: the
  * hard-link CAS must serialize committers that share no JVM locks,
  * and durableOnce's marker file is exactly the cross-JVM once.
  *
  * Asserted over the union of all three processes' work:
  *  1. DURABILITY — every key whose append() returned in ANY process
  *     is present in the final version;
  *  2. LINEAR HISTORY — the retained versions form a contiguous
  *     1-step suffix (no skipped/duplicate version numbers under
  *     cross-process CAS contention);
  *  3. ARTIFACT IDENTITY — every process reads the identical
  *     durableOnce artifact (exactly-one build serves all JVMs).
  */
class SnapshotMultiJvmSpec extends SparkSpecBase {

  test("3 JVMs of concurrent append/compact/vacuum/artifact keep " +
    "every committed row, a linear history and one shared artifact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snapmjvm").toString
    SnapshotTable.commit(root, Seq((1L, "init")).toDF("k", "s"))

    // the forked test JVM's own classpath contains the main classes
    // and every Spark jar — hand it to the children verbatim, with
    // the same JDK17 add-opens the parent needed
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val artFp = s"mjvm_${System.nanoTime()}" // fresh artifact per run

    val procs = (1 to 3).map { seed =>
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.SnapshotStressWorker",
        root, seed.toString, "3", artFp)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      // stdout goes to a FILE, not a pipe read before waitFor (r12
      // review): a blocking readAllBytes on a wedged worker would hang
      // the suite unboundedly — with a file sink, waitFor's 300 s is
      // the only wait, and a killed worker's partial output is still
      // readable for the failure message
      val outFile = Files.createTempFile(s"graft_mjvm_w$seed", ".log")
      pb.redirectOutput(outFile.toFile)
      (seed, pb.start(), outFile)
    }
    val outputs = procs.map { case (seed, p, outFile) =>
      val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly()
      val out = Files.readString(outFile)
      Files.deleteIfExists(outFile)
      assert(finished, s"worker $seed timed out.\n$out")
      assert(p.exitValue() == 0,
        s"worker $seed exited ${p.exitValue()}.\n$out")
      assert(out.contains("STRESS OK"), s"worker $seed no OK marker.\n$out")
      out
    }

    // 1. durability: every acknowledged append from any process
    val appended = outputs.flatMap(_.linesIterator
      .filter(_.startsWith("STRESS APPENDED "))
      .map(_.stripPrefix("STRESS APPENDED ").trim.toLong))
    assert(appended.size == 3 * 2 * 3, s"expected 18 acks, got $appended")
    val finalKeys = SnapshotTable.read(spark, root)
      .select("k").as[Long].collect().toSet
    val lost = appended.filterNot(finalKeys)
    assert(lost.isEmpty, s"acknowledged appends lost under contention: $lost")
    assert(finalKeys.contains(1L), "initial row lost")

    // 2. linear history: retained versions are a contiguous suffix
    val vs = SnapshotTable.versions(root)
    assert(vs == (vs.min to vs.max),
      s"non-contiguous version history under cross-process CAS: $vs")
    // 1 init + 18 appends + compact commits = max version
    val compacts = outputs.flatMap(_.linesIterator
      .filter(_.startsWith("STRESS COMPACTS "))
      .map(_.stripPrefix("STRESS COMPACTS ").trim.toInt)).sum
    assert(vs.max == 1 + 18 + compacts,
      s"version count ${vs.max} != 1 + 18 appends + $compacts compacts")

    // 3. artifact identity across JVMs
    val sums = outputs.flatMap(_.linesIterator
      .filter(_.startsWith("STRESS ARTSUM "))
      .map(_.stripPrefix("STRESS ARTSUM ").trim)).distinct
    assert(sums.size == 1, s"durableOnce served divergent artifacts: $sums")

    TempDirs.deleteRecursively(Paths.get(root))
  }
}
