package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM scoped temp directories for queries that materialize an
  * intermediate layout (bucketed tables, multi-file scans, partitioned
  * sinks, stream source chunks).
  *
  * One directory per (kind, input-dir) key, reused across repeated
  * Verify/Bench/test invocations in the same JVM — round 2 created a
  * fresh `Files.createTempDirectory` on EVERY query invocation with no
  * cleanup, accumulating /tmp garbage across harness runs. A shutdown
  * hook removes everything this JVM created. Writers use
  * `mode("overwrite")`, so reuse is idempotent.
  */
object TempDirs {

  private val dirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }

  /** Stable directory for `kind` scoped to input dir `d` (different
    * scale factors must not share layouts).
    */
  def scoped(kind: String, d: String): String = {
    val key = s"${kind}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    dirs.getOrElseUpdate(key, {
      val p = Files.createTempDirectory(s"graft_$key")
      sys.addShutdownHook(deleteRecursively(p))
      p.toString
    })
  }

  /** Delete a directory's CONTENTS (keep the dir): build steps whose
    * failure can leave half-committed state (streaming checkpoints)
    * call this before a retry so `writeOnce`'s retry-on-failure never
    * resumes against a poisoned artifact.
    */
  def clearDir(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.list(p)
      try s.forEach(f => deleteRecursively(f))
      finally s.close()
    }
  }

  private val written =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private val writeLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Run `w` at most once per (JVM, key) — for source layouts that a
    * checkpointed or layout-asserting consumer depends on, where a
    * rewrite would present fresh part-file names and change observed
    * behavior.
    *
    * Mutual exclusion is per key: TrieMap.getOrElseUpdate alone is
    * atomic only in which RESULT is kept, not in running the thunk
    * once — two concurrent callers could both execute the build block
    * against the same artifact dir (racing parquet overwrites or
    * streaming checkpoints). A per-key monitor makes the second
    * caller wait for the first build instead; a failed build stores
    * nothing, so the next caller retries (same retry contract as
    * before). Per-key locks avoid cross-key blocking, but nested
    * writeOnce calls acquire monitors in nesting order — so nesting
    * must stay ACYCLIC across the codebase (today it is
    * one-directional: builds read sub-artifacts, never the reverse);
    * two opposite-order nestings would deadlock like any two-lock
    * cycle.
    */
  def writeOnce(key: String)(w: => Unit): Unit = {
    val lock = writeLocks.getOrElseUpdate(key, new Object)
    lock.synchronized {
      if (!written.contains(key)) { w; written.put(key, true) }
    }
  }
}
