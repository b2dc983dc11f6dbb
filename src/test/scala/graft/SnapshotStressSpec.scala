package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.Random

import graft.sources.SnapshotTable

/** Multi-writer stress for the snapshot-commit protocol (r10 verdict
  * item 5): the r10 compact-vs-append race fix (`commitIfParent`,
  * commit e44b1ed) was proven on ONE hand-written interleaving;
  * concurrency bugs live in the interleavings nobody wrote down. Here
  * 100 seeded rounds each run concurrent appenders, a compactor and a
  * vacuum against a fresh table with randomized start jitter, then
  * assert the two invariants every commit protocol owes its callers:
  *
  *  1. DURABILITY — every row whose append() returned survives to the
  *     final version (a lost-update means compact re-landed stale
  *     content over a concurrent append, the exact r10 bug class);
  *  2. LINEAR HISTORY — retained versions are a contiguous suffix
  *     1-step apart ending at exactly (#initial + #appends +
  *     #successful compacts): no skipped, duplicated, or phantom
  *     version numbers under contention.
  *
  * The compactor tolerates two benign outcomes a real deployment also
  * tolerates: losing every CAS slot (it reports, nothing corrupts) and
  * reading a version the concurrent vacuum just retired (the
  * vacuum-retention race every manifest format documents; retainLast
  * is sized so it is rare, and a hit only retries).
  */
class SnapshotStressSpec extends SparkSpecBase {

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_snapstress_$tag")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }

  test("100 seeded interleavings of appenders + compactor + vacuum " +
    "lose no committed row and keep history linear") {
    import spark.implicits._
    val nAppenders = 3
    val pool = Executors.newFixedThreadPool(nAppenders + 2)
    try {
      (1 to 100).foreach { seed =>
        val rng = new Random(seed)
        val root = freshRoot(s"s$seed")
        SnapshotTable.commit(root, Seq((seed.toLong * 1000L, "init")).toDF("k", "s"))
        val jitters = Array.fill(nAppenders + 2)(rng.nextInt(25))
        val start = new CountDownLatch(1)
        @volatile var compacts = 0
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        val appendIds = (1 to nAppenders).map(t => seed.toLong * 1000L + t)
        val tasks =
          appendIds.zipWithIndex.map { case (id, i) =>
            pool.submit(new Runnable {
              def run(): Unit = try {
                start.await()
                Thread.sleep(jitters(i).toLong)
                SnapshotTable.append(root, Seq((id, s"t$i")).toDF("k", "s"))
                ()
              } catch { case e: Throwable => failures.add(e); () }
            })
          } :+
            pool.submit(new Runnable { // compactor
              def run(): Unit = try {
                start.await()
                Thread.sleep(jitters(nAppenders).toLong)
                // retry the vacuum-retention race (read of a just-
                // retired version) a few times; surface anything else
                var attempts = 0
                var done = false
                while (!done && attempts < 5) {
                  try { SnapshotTable.compact(spark, root, 1); compacts += 1; done = true }
                  catch {
                    case e: IllegalArgumentException
                      if e.getMessage != null && e.getMessage.contains("no manifest") =>
                      attempts += 1
                  }
                }
              } catch { case e: Throwable => failures.add(e); () }
            }) :+
            pool.submit(new Runnable { // vacuum (orphan guard default)
              def run(): Unit = try {
                start.await()
                Thread.sleep(jitters(nAppenders + 1).toLong)
                // retainLast = 4: a manifest drop can only fire after
                // every writer committed (≤ 5 versions exist), so the
                // vacuum-retention race vs a mid-flight append — the
                // documented hazard retention WINDOWS answer in
                // production, not code — can't flake the test, while
                // the orphan walk still runs concurrently with writes
                SnapshotTable.vacuum(root, 4)
                ()
              } catch { case e: Throwable => failures.add(e); () }
            })
        start.countDown()
        tasks.foreach(_.get(120, TimeUnit.SECONDS))
        assert(failures.isEmpty,
          s"seed $seed: ${failures.peek()}")
        // 1. durability: init + every appended row, exactly once
        val got = SnapshotTable.read(spark, root).select("k")
          .collect().map(_.getLong(0)).sorted.toSeq
        val want = (seed.toLong * 1000L +: appendIds).sorted
        assert(got == want, s"seed $seed: rows $got != $want")
        // 2. linear history: contiguous retained suffix ending at the
        // exact op count (1 init + appends + successful compacts)
        val vs = SnapshotTable.versions(root)
        assert(vs == (vs.head to vs.last),
          s"seed $seed: non-contiguous versions $vs")
        assert(vs.last == (1 + nAppenders + compacts).toLong,
          s"seed $seed: latest ${vs.last} != ${1 + nAppenders + compacts}")
        // deterministic post-quiescence drop: retention down to the
        // newest version must spare every row (they're all referenced)
        SnapshotTable.vacuum(root, 1)
        assert(SnapshotTable.read(spark, root).count() == want.length.toLong,
          s"seed $seed: post-vacuum row loss")
      }
    } finally pool.shutdownNow()
  }
}
