package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal snapshot-commit table format (SURVEY.md §2.M boundary,
  * closed in r8): a table is a directory of immutable parquet data
  * files plus a `_manifests/` log of versioned JSON manifests, each
  * listing the complete file set of one table version.
  *
  * Commit protocol (the Delta/Iceberg commit shape reduced to its
  * core, as published in the Delta Lake VLDB'20 and Iceberg spec
  * docs — no code consulted):
  *  1. write the new version's data files under `data/<uuid>/`
  *     (immutable once written, invisible until a manifest names them);
  *  2. write the manifest JSON to a temp file in `_manifests/`;
  *  3. LINK it to `v<N>.json` — `Files.createLink` is atomic and fails
  *     if the target exists, so claiming a version number is a
  *     compare-and-swap: the winner owns v<N>, the loser re-reads the
  *     latest version and retries at a higher N.
  *
  * Consequences:
  *  - readers bind to ONE manifest, so every read is a consistent
  *    snapshot — a concurrent commit can never expose a half-written
  *    file set (data files are invisible until their manifest lands);
  *  - historical versions stay readable (`VERSION AS OF n` time
  *    travel) until a retention job deletes their manifests;
  *  - concurrent committers serialize into distinct consecutive
  *    versions; the LAST commit wins the "latest" pointer, which is
  *    simply max(N) — there is no separate pointer file to corrupt.
  *
  * Scale notes (100 TB): the manifest lists files, not rows — its size
  * is O(files), and the CAS is one metadata operation regardless of
  * data volume. Commits here rewrite the full file set (copy-on-write
  * over a fixture-sized table); a production MERGE commits
  * base-files-minus-rewritten plus new files into the same manifest
  * shape — the protocol is file-granular by construction, only the
  * caller's choice of what to rewrite changes. On an object store the
  * hard-link CAS becomes the store's if-none-match put; the manifest
  * format is unchanged.
  */
object SnapshotTable {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")
  private def manifestPath(root: String, v: Long): Path =
    manifestDir(root).resolve(s"v$v.json")

  private val ManifestName = """v(\d+)\.json""".r

  /** Manifest entry for an absolute file path: relative when the file
    * lives under this root, absolute (normalized) otherwise — a
    * shallow clone's foreign references must never be rewritten into
    * `../`-laced pseudo-relative paths (r9: append/restore did, which
    * made the same source file appear under two different strings).
    */
  private def manifestEntry(root: String, abs: String): String = {
    val r = Paths.get(root).toAbsolutePath.normalize()
    val p = Paths.get(abs).toAbsolutePath.normalize()
    if (p.startsWith(r)) r.relativize(p).toString else p.toString
  }

  /** All committed versions, ascending (empty for a fresh table). */
  def versions(root: String): Seq[Long] = {
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.flatMap(_.getFileName.toString match {
      case ManifestName(n) => Some(n.toLong)
      case _ => None
    }).toSeq.sorted
    finally s.close()
  }

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  /** The data files of version `v`, as absolute paths. */
  def manifestFiles(root: String, v: Long): Seq[String] = {
    val p = manifestPath(root, v)
    require(Files.exists(p), s"no manifest for version $v at $p")
    val json = Files.readString(p)
    // the manifest is machine-written with known-safe relative paths
    // (uuid dirs + parquet part names — no quotes or brackets), so a
    // regex pull of the files array is exact
    val arr = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalStateException(s"torn manifest $p: $json"))
      .group(1)
    // ABSOLUTE + normalized so the same physical file always surfaces
    // as ONE string — manifest set arithmetic (vacuum refcounts, clone
    // sharing checks) is string-keyed, and vacuum's orphan sweep
    // compares against walked paths that are absolutized; a relative
    // `root` must not make the retained set unmatchable (r11 ADVICE:
    // that mismatch deleted live, manifest-referenced data dirs)
    """"([^"]+)"""".r.findAllMatchIn(arr).map(_.group(1))
      .map(rel => Paths.get(root).toAbsolutePath.resolve(rel)
        .normalize().toString).toSeq
  }

  /** Commit `df` as the complete content of the table's next version;
    * returns the version number claimed. Safe under concurrent
    * committers (see protocol scaladoc).
    */
  def commit(root: String, df: DataFrame): Long = {
    Files.createDirectories(manifestDir(root))
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = Paths.get(root, "data", uuid)
    df.write.parquet(dataDir.toString)
    val files = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(name => s"data/$uuid/$name")
      finally s.close()
    }
    require(files.nonEmpty,
      s"refusing to commit an empty file set to $root (df had no output files)")
    var v = latestVersion(root).getOrElse(0L) + 1
    while (true) {
      val tmp = Files.createTempFile(manifestDir(root), ".commit", ".tmp")
      Files.writeString(tmp,
        s"""{"version":$v,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""")
      try {
        Files.createLink(manifestPath(root, v), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          v = math.max(v + 1, latestVersion(root).getOrElse(0L) + 1)
      }
    }
    v // unreachable
  }

  /** Write `df`'s files and attempt to commit them as EXACTLY version
    * `expectedParent + 1` — one CAS attempt, no version bumping. Some
    * writers' content is a pure function of the parent version they
    * read (compaction, any read-modify-write): for those, commit()'s
    * bump-and-retry would re-land STALE content above a concurrent
    * commit and silently drop its rows (r10 review). Returns the
    * claimed version, or None if another writer won the slot — the
    * caller must re-read and rebuild before retrying. The orphaned
    * data files of a lost attempt are unreferenced by every manifest
    * and reclaimed by the next vacuum.
    */
  def commitIfParent(root: String, df: DataFrame,
      expectedParent: Long): Option[Long] = {
    Files.createDirectories(manifestDir(root))
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = Paths.get(root, "data", uuid)
    df.write.parquet(dataDir.toString)
    val files = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(name => s"data/$uuid/$name")
      finally s.close()
    }
    require(files.nonEmpty,
      s"refusing to commit an empty file set to $root (df had no output files)")
    val v = expectedParent + 1
    val tmp = Files.createTempFile(manifestDir(root), ".commit", ".tmp")
    Files.writeString(tmp,
      s"""{"version":$v,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""")
    try {
      Files.createLink(manifestPath(root, v), tmp)
      Files.deleteIfExists(tmp)
      Some(v)
    } catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        None
    }
  }

  /** Read one table version (`VERSION AS OF v`); None = latest. */
  def read(spark: SparkSession, root: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"snapshot table $root has no commits"))
    spark.read.parquet(manifestFiles(root, v): _*)
  }

  /** Read one version with parquet schema merging across its file set
    * — the ADDITIVE schema-evolution read: an append commit may carry
    * files with new columns, and the merged read surfaces old files'
    * missing columns as nulls. Time-travel reads of pre-evolution
    * versions keep the old schema untouched (each manifest is a
    * consistent file set; the schema change rides the commit protocol
    * like any other change).
    */
  def readMerged(spark: SparkSession, root: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.orElse(latestVersion(root)).getOrElse(
      throw new IllegalStateException(s"snapshot table $root has no commits"))
    spark.read.option("mergeSchema", "true")
      .parquet(manifestFiles(root, v): _*)
  }

  /** Append commit: the next version references the PARENT manifest's
    * files plus `df`'s newly-written files — the micro-batch-ingest
    * commit mode, where a version shares all but its delta with its
    * parent and the manifest stays O(files) while data is never
    * rewritten. Same CAS as `commit`; on a retry the re-read parent
    * may have advanced, so the file union is recomputed against the
    * CURRENT latest each attempt (append-atop-whatever-won is the
    * documented last-writer semantics).
    */
  def append(root: String, df: DataFrame): Long = {
    Files.createDirectories(manifestDir(root))
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = Paths.get(root, "data", uuid)
    df.write.parquet(dataDir.toString)
    val fresh = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
        .map(name => s"data/$uuid/$name")
      finally s.close()
    }
    while (true) {
      val parent = latestVersion(root)
      val base = parent.map(v => manifestFiles(root, v)
        .map(abs => manifestEntry(root, abs)))
        .getOrElse(Seq.empty)
      val files = base ++ fresh
      val v = parent.getOrElse(0L) + 1
      val tmp = Files.createTempFile(manifestDir(root), ".commit", ".tmp")
      Files.writeString(tmp,
        s"""{"version":$v,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""")
      try {
        Files.createLink(manifestPath(root, v), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: FileAlreadyExistsException => Files.deleteIfExists(tmp)
      }
    }
    -1L // unreachable
  }

  /** RESTORE: make version `v`'s file set the newest version — a
    * rollback that PRESERVES history (the bad versions stay
    * time-travel-readable until vacuumed) and moves no data: the new
    * manifest references the old version's files verbatim, so the
    * operation is one metadata CAS regardless of table size.
    */
  /** Small-file compaction: rewrite the LATEST version's content into
    * AT MOST `targetFiles` files (coalesce can only merge — the read's
    * own partition packing is the floor, so a table that already reads
    * as one partition compacts to one file) and commit the rewrite as
    * a NEW version — content-identical (the checksum contract
    * `table_compact` proves), old versions untouched and still
    * time-travelable, old data files reclaimed later by `vacuum`
    * exactly like any other superseded version. `coalesce` (not
    * repartition) keeps the rewrite shuffle-free: each output task
    * concatenates whole input partitions — at 100 TB this is the
    * nightly maintenance job that turns a day of micro-batch appends
    * into scan-efficient files. Commits through `commitIfParent`
    * pinned to the version it read: a concurrent append winning the
    * slot forces a re-read-and-rewrite retry rather than silently
    * re-landing stale pre-append content (r10 review — commit()'s
    * bump-and-retry is only safe for writers whose content doesn't
    * depend on the parent). Returns the new version.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      targetFiles: Int, maxAttempts: Int = 10): Long = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    var attempt = 0
    while (attempt < maxAttempts) {
      val parent = latestVersion(root).getOrElse(
        throw new IllegalStateException(s"snapshot table $root has no commits"))
      commitIfParent(root,
        read(spark, root, Some(parent)).coalesce(targetFiles),
        parent) match {
        case Some(v) => return v
        case None => attempt += 1 // lost the slot: re-read and rewrite
      }
    }
    throw new IllegalStateException(
      s"compact($root) lost the commit race $maxAttempts times")
  }

  /** Files ADDED between two versions: manifest(to) minus
    * manifest(from) — pure metadata arithmetic, no data read. On an
    * append lineage this is exactly the incremental delta (each child
    * manifest = parent files + new files); a REWRITE commit in the
    * range surfaces its whole rewritten file set, the same caveat
    * every manifest-diff CDC (Iceberg incremental scan, Delta CDF
    * without the change log) carries — callers on mixed lineages
    * should diff row-level checksums instead. Both versions must
    * still be retained: a vacuumed `fromV` raises manifestFiles'
    * versioned require rather than silently returning a full scan.
    */
  def incrementalFiles(root: String, fromV: Long, toV: Long): Seq[String] = {
    require(fromV <= toV, s"fromV $fromV > toV $toV")
    val base = manifestFiles(root, fromV).toSet
    manifestFiles(root, toV).filterNot(base)
  }

  /** Read only the rows landed between `fromV` (exclusive) and `toV`
    * (inclusive) — the downstream-consumer primitive: a job that ran
    * at v_from catches up by scanning ONLY the delta files, never the
    * table. Empty delta reads as an empty frame with the to-version's
    * schema.
    */
  def readIncremental(spark: org.apache.spark.sql.SparkSession,
      root: String, fromV: Long, toV: Long): DataFrame = {
    val files = incrementalFiles(root, fromV, toV)
    if (files.isEmpty)
      spark.read.parquet(manifestFiles(root, toV): _*).limit(0)
    else spark.read.parquet(files: _*)
  }

  def restore(root: String, v: Long): Long = {
    val files = manifestFiles(root, v)
      .map(abs => manifestEntry(root, abs))
    var next = latestVersion(root).getOrElse(0L) + 1
    while (true) {
      val tmp = Files.createTempFile(manifestDir(root), ".commit", ".tmp")
      Files.writeString(tmp,
        s"""{"version":$next,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""")
      try {
        Files.createLink(manifestPath(root, next), tmp)
        Files.deleteIfExists(tmp)
        return next
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          next = math.max(next + 1, latestVersion(root).getOrElse(0L) + 1)
      }
    }
    -1L // unreachable
  }

  /** SHALLOW CLONE (r9): a new table at `dstRoot` whose v1 manifest
    * references the source version's data files VERBATIM (as absolute
    * paths — `manifestFiles`' root-resolve returns an absolute entry
    * unchanged) — zero data copy, O(files) metadata, any table size.
    * The clone then evolves independently: appends/commits add its own
    * relative files next to the foreign absolute ones. The classic
    * shallow-clone hazard (a clone's VACUUM sweeping the source's
    * files) is structurally closed here: `vacuum` only ever deletes
    * files UNDER its own root, so foreign references simply age out of
    * the clone's manifests without touching the source.
    */
  def cloneTo(srcRoot: String, v: Long, dstRoot: String): Long = {
    val files = manifestFiles(srcRoot, v) // absolute
    Files.createDirectories(manifestDir(dstRoot))
    var next = latestVersion(dstRoot).getOrElse(0L) + 1
    while (true) {
      val tmp = Files.createTempFile(manifestDir(dstRoot), ".commit", ".tmp")
      Files.writeString(tmp,
        s"""{"version":$next,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""")
      try {
        Files.createLink(manifestPath(dstRoot, next), tmp)
        Files.deleteIfExists(tmp)
        return next
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          next = math.max(next + 1, latestVersion(dstRoot).getOrElse(0L) + 1)
      }
    }
    -1L // unreachable
  }

  /** MERGE-BACK (r9): fold a branch's divergence since `baseVersion`
    * into this table as ONE metadata commit — the append-only
    * three-way merge (base = the version the branch was cut at):
    * delta = files the branch's latest manifest references beyond
    * dst@baseVersion, committed on top of dst's CURRENT latest (so
    * mainline progress since the cut survives). Zero data copy, the
    * branch stays intact, and a re-merge is a file-set no-op (delta
    * entries already present dedupe away). Returns the new version.
    */
  def mergeFrom(dstRoot: String, branchRoot: String,
      baseVersion: Long): Long = {
    val base = manifestFiles(dstRoot, baseVersion).toSet
    val bv = latestVersion(branchRoot).getOrElse(throw
      new IllegalStateException(s"branch $branchRoot has no commits"))
    val delta = manifestFiles(branchRoot, bv).filterNot(base)
    while (true) {
      val parent = latestVersion(dstRoot)
      val merged = (parent.map(v => manifestFiles(dstRoot, v))
        .getOrElse(Seq.empty) ++ delta)
        .distinct // re-merge safety: never list one file twice
        .map(abs => manifestEntry(dstRoot, abs))
      val v = parent.getOrElse(0L) + 1
      val tmp = Files.createTempFile(manifestDir(dstRoot), ".commit", ".tmp")
      Files.writeString(tmp,
        s"""{"version":$v,"files":[${merged.map("\"" + _ + "\"").mkString(",")}]}""")
      try {
        Files.createLink(manifestPath(dstRoot, v), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: FileAlreadyExistsException => Files.deleteIfExists(tmp)
      }
    }
    -1L // unreachable
  }

  /** Retention (VACUUM): keep the newest `retainLast` manifests,
    * delete the older manifests and every data file NO retained
    * manifest references. Returns (manifestsDeleted, filesDeleted).
    * Manifests are deleted before their files, so no reader can bind
    * to a manifest whose files are being swept; files shared with a
    * retained version (append lineage) survive — reference-counted by
    * the retained manifest set, exactly like a production format's
    * VACUUM walking its commit log.
    *
    * Also sweeps ORPHANS (r11, ADVICE): whole data/<uuid> dirs never
    * referenced by ANY manifest — the leftovers of a `commitIfParent`
    * attempt that lost its CAS slot, which the dropped-manifest walk
    * above can never see (they were never committed). The sweep unit
    * is the DIRECTORY (a dir with any retained file is untouchable,
    * which also protects retained commits' _SUCCESS/.crc sidecars that
    * manifests don't list), and only dirs whose newest entry has aged
    * past `orphanAgeMs` go — a young unreferenced dir may be an
    * IN-FLIGHT commit, not garbage (the same age guard production
    * formats use). Swept regular files count into filesDeleted.
    */
  def vacuum(root: String, retainLast: Int,
             orphanAgeMs: Long = 600000L): (Int, Int) = {
    require(retainLast >= 1, s"must retain at least 1 version, got $retainLast")
    val vs = versions(root)
    val drop = vs.dropRight(retainLast)
    val keep = vs.takeRight(retainLast)
    // tolerate a CONCURRENT vacuum having already deleted a manifest
    // between our versions() snapshot and this read (r12 multi-JVM
    // review): production retention jobs overlap, and a vanished
    // manifest means the other vacuum owned that version — its files
    // are either already swept (drop side) or were retained by a
    // NEWER snapshot than ours (keep side); both are skip-safe, and
    // throwing here turned a benign overlap into a worker failure.
    def filesIfManifestStillThere(v: Long): Seq[String] =
      if (Files.exists(manifestPath(root, v))) {
        try manifestFiles(root, v)
        catch { // deleted between the exists check and the read
          case _: IllegalArgumentException => Seq.empty
          case _: java.nio.file.NoSuchFileException => Seq.empty
        }
      } else Seq.empty
    val keptFiles = keep.flatMap(filesIfManifestStillThere).toSet
    val victims =
      drop.flatMap(filesIfManifestStillThere).toSet -- keptFiles
    drop.foreach(v => Files.deleteIfExists(manifestPath(root, v)))
    var filesDeleted = 0
    // containment guard (r9): only sweep files UNDER this root — a
    // shallow clone's manifests reference the SOURCE table's files by
    // absolute path, and a clone's vacuum must never reach into the
    // source (the documented shallow-clone hazard, closed structurally)
    // normalize() matches manifestFiles' normalized absolute strings —
    // a root passed with '.'/'..' segments must not defeat the prefix
    // check and silently sweep nothing (ADVICE r9); skipped foreign
    // paths are counted so a no-op sweep is observable
    val rootAbs = Paths.get(root).toAbsolutePath.normalize()
    var skippedForeign = 0
    victims.foreach { f =>
      val p = Paths.get(f).toAbsolutePath.normalize()
      if (p.startsWith(rootAbs)) {
        if (Files.deleteIfExists(p)) filesDeleted += 1
      } else skippedForeign += 1
    }
    if (skippedForeign > 0)
      System.err.println(
        s"[snapshot] vacuum($root): skipped $skippedForeign foreign-path " +
          "data files (shallow-clone references outside this root)")
    // orphan sweep, WHOLE-DIR rule (r11 review): a lost commitIfParent
    // attempt leaves an entire data/<uuid> dir that no manifest has
    // ever referenced, so the sweep unit is the directory — a dir goes
    // only when NONE of its files are retained, it holds at least one
    // file, and nothing in it (dir mtime included) is younger than the
    // age guard. Two defect classes a per-FILE rule had: it deleted
    // retained commits' _SUCCESS/.crc sidecars (manifests list only
    // *.parquet, but a retained commit's dir contains referenced files
    // so the dir rule never touches it), and an unguarded walk/stat
    // threw on files a concurrent Hadoop committer deleted mid-walk —
    // each dir's sweep now tolerates those races individually.
    val retainedFiles = versions(root)
      .flatMap(filesIfManifestStillThere).toSet
    val dataRootForOrphans = Paths.get(root, "data")
    if (Files.isDirectory(dataRootForOrphans)) {
      val cutoff = System.currentTimeMillis() - orphanAgeMs
      val dirs = Files.list(dataRootForOrphans)
      try dirs.iterator().asScala.filter(p => Files.isDirectory(p))
        .foreach { dir =>
          try {
            val w = Files.walk(dir)
            val entries =
              try w.iterator().asScala.toVector finally w.close()
            val files = entries.filter(p => Files.isRegularFile(p))
            val referenced = files.exists(p => retainedFiles.contains(
              p.toAbsolutePath.normalize().toString))
            val youngest = entries
              .map(p => Files.getLastModifiedTime(p).toMillis).max
            // file-LESS aged trees go too (r11 review): a writer
            // killed after the committer creates _temporary/ but
            // before any part file lands leaves a dir no file rule
            // can ever match — without this branch it leaks forever
            if (!referenced && youngest < cutoff) {
              files.foreach(p =>
                if (Files.deleteIfExists(p)) filesDeleted += 1)
              entries.filter(p => Files.isDirectory(p))
                .sortBy(-_.getNameCount)
                .foreach(p => Files.deleteIfExists(p))
            }
          } catch {
            // a concurrent writer created/removed entries mid-walk:
            // skip this dir, the next vacuum sees a settled state
            case _: java.io.IOException => ()
            case _: java.io.UncheckedIOException => ()
          }
        }
      finally dirs.close()
    }
    // (the whole-dir orphan rule above also collects empty and
    // file-less husk dirs once aged — no separate sweep needed)
    (drop.length, filesDeleted)
  }
}
