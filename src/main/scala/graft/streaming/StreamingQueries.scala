package graft.streaming

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY.md §2.I — Structured Streaming over `events`.
  *
  * Football reading: live match feed — minute-windowed possession/shots,
  * session = one attack sequence, late events from flaky collectors
  * (derived — `/root/reference/README.md:2`).
  *
  * Batch/stream parity is the design (Dataflow-model discipline): each
  * windowed shape is a batch query over `events` (DuckDB-oracle-checked)
  * and is replayed through a real micro-batch execution — every replay
  * streams from a parquet FILE source written distributed and once per
  * JVM (as of r4 no replay collects the feed to the driver; queries
  * needing controlled watermark epochs run multiple AvailableNow
  * passes against one checkpoint). Event times are µs-truncated
  * throughout (SURVEY.md §1.3).
  *
  * Scale notes: all stateful ops key by user/window — state is bounded
  * by |keys|, watermarks bound it in time; memory-sink collection is
  * test-harness-only, production sinks would be files/Kafka.
  */
object StreamingQueries {

  /** µs-domain event row used for deterministic MemoryStream replay. */
  case class Ev(event_id: Long, ts_us: Long, user_id: Long,
                event_type: String, value: Double)

  /** Ev plus the TimestampType column the watermark (and so event-time
    * timers) attaches to.
    */
  case class EvW(event_id: Long, ts_us: Long, user_id: Long,
                 event_type: String, value: Double,
                 ts_ts: java.sql.Timestamp)

  /** Projected timer-input row (r14, guide §2.3): only the columns the
    * inactivity fold reads, plus the watermark timestamp — the timers
    * replay's analogue of the running_sum projection discipline.
    */
  case class EvT(ts_us: Long, user_id: Long, value: Double,
                 ts_ts: java.sql.Timestamp)

  /** Per-user running money sum via the Spark 4 `transformWithState`
    * StatefulProcessor API (typed ValueState, RocksDB state store).
    * Value is kept in exact cents (long) so the emitted running totals
    * are decimal-deterministic.
    */
  private class RunningCents
      extends StatefulProcessor[Long, (Long, Double), (Long, Long)] {
    @transient private var sum: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sum = getHandle.getValueState[Long](
        "sum_cents", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
                                 timers: TimerValues): Iterator[(Long, Long)] = {
      val add = rows.map(e => math.round(e._2 * 100)).sum
      val s = (if (sum.exists()) sum.get() else 0L) + add
      sum.update(s)
      Iterator((user, s))
    }
  }

  /** Event-time-TIMER processor (r9): per-user inactivity close. Each
    * input batch folds (n, cents, max event ms) into ValueState and
    * moves the user's single inactivity timer to maxSeen + 30 min
    * (delete-then-register — at most one live timer per key); when the
    * WATERMARK passes a timer, `handleExpiredTimer` emits the user's
    * closed totals and clears the state. The timer surface is the
    * point: output is produced by TIME passing, not by input arriving —
    * the session-timeout/SLA-alarm primitive mapGroupsWithState spelled
    * with setTimeoutTimestamp and Spark 4's API spells this way.
    */
  private class InactivityClose
      extends StatefulProcessor[Long, EvT, (Long, Long, Long)] {
    @transient private var agg: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Long, Long)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)
    private def timerAt(maxMs: Long): Long = maxMs + 30L * 60 * 1000
    // input is the projected EvT (ts_us, user_id, value + the watermark
    // column) — event_id/event_type never reached the fold (r14, §2.3)
    override def handleInputRows(user: Long, rows: Iterator[EvT],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, c, m) =
        if (agg.exists()) agg.get() else (0L, 0L, Long.MinValue)
      val hadState = n > 0
      rows.foreach { e =>
        n += 1
        c += math.round(e.value * 100)
        m = math.max(m, e.ts_us / 1000)
      }
      if (hadState) getHandle.deleteTimer(timerAt(agg.get()._3))
      agg.update((n, c, m))
      getHandle.registerTimer(timerAt(m))
      Iterator.empty
    }
    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      if (agg.exists()) {
        val (n, c, _) = agg.get()
        agg.clear()
        Iterator((user, n, c))
      } else Iterator.empty
    }
  }

  /** Initial-state processor (r9): warm-start migration — state is
    * BOOTSTRAPPED from a batch table before the first micro-batch
    * (handleInitialState), then the stream increments on top. The
    * ×1000 weighting makes the bootstrap's contribution provably
    * present in every emission (a processor that ignored the initial
    * state would emit plain counts and hash-mismatch).
    */
  private class WarmStartCount
      extends StatefulProcessorWithInitialState[Long, Long, (Long, Long), Long] {
    @transient private var score: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      score = getHandle.getValueState[Long]("score",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInitialState(user: Long, init: Long,
                                    timers: TimerValues): Unit =
      score.update(init * 1000L)
    // input is the projected user_id alone (r14, guide §2.3): the
    // processor only COUNTS rows, so shipping whole Ev rows through
    // the groupByKey shuffle and the typed encoder was 5× the bytes
    // for zero information — the running_sum projection discipline
    override def handleInputRows(user: Long, rows: Iterator[Long],
                                 timers: TimerValues): Iterator[(Long, Long)] = {
      val s = (if (score.exists()) score.get() else 0L) + rows.size
      score.update(s)
      Iterator((user, s))
    }
  }

  /** ListState processor (r9): per-user bounded recent-items
    * retention — the serving-state shape ("last N events per
    * entity"). State = the top-3 (ts, event_id) pairs so far; the
    * top-k merge is associative, so the final state is
    * chunking-independent, and each emission is the flattened
    * desc-sorted pairs — element-wise monotone in every position and
    * length, so the LEXICOGRAPHIC MAX over Update-mode emissions is
    * the final retention (the array-typed analogue of the monotone
    * running-sum discipline).
    */
  private class RecentTop3
      extends StatefulProcessor[Long, (Long, Long, Long), (Long, Seq[Long])] {
    @transient private var st: ListState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(Long, Long)]("recent",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    // input is the projected (user_id, ts_us, event_id) triple (r14,
    // guide §2.3): event_type/value never reached the top-3 merge, so
    // the full-Ev shuffle and encode was pure overhead
    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
                                 timers: TimerValues): Iterator[(Long, Seq[Long])] = {
      val existing = if (st.exists()) st.get().toSeq else Seq.empty
      val merged = (existing ++ rows.map(e => (e._2, e._3)))
        .sortBy(p => (-p._1, -p._2)).take(3)
      st.put(merged.toArray)
      Iterator((user, merged.flatMap(p => Seq(p._1, p._2))))
    }
  }

  /** MapState processor (r9): per-user event_type → count map — the
    * keyed-sub-state surface of the Spark 4 API (ValueState and timer
    * coverage live in RunningCents / InactivityClose). Each batch
    * folds its rows into the map and re-emits the FULL updated map as
    * (user, type, n) rows; counts are monotone, so the per-(user,
    * type) max over Update-mode emissions is the final count under
    * ANY file chunking (the stream_tws_running_sum discipline).
    */
  private class TypeCounts
      extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var m: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    // input is the projected (user_id, event_type) pair (r14, guide
    // §2.3): the fold reads only the type column
    override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
                                 timers: TimerValues): Iterator[(Long, String, Long)] = {
      // fold the batch locally FIRST, then touch MapState once per
      // distinct type: the r11 probe put map_counts' addBatch at
      // 1.3 s because the old per-row containsKey/getValue/updateValue
      // triple paid 3 RocksDB ops per input row — state traffic should
      // scale with |keys touched|, never with row count (the same
      // map-side-combine principle as every batch aggregate here)
      val local = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach { e =>
        local.update(e._2, local.getOrElse(e._2, 0L) + 1L)
      }
      local.foreach { case (k, add) =>
        val cur = if (m.containsKey(k)) m.getValue(k) else 0L
        m.updateValue(k, cur + add)
      }
      // snapshot + sort so the emission order is deterministic
      m.iterator().map { case (k, v) => (user, k, v) }
        .toSeq.sortBy(_._2).iterator
    }
  }

  /** TTL processor (r13): per-user event count in a ValueState whose
    * entries EXPIRE `ttlMs` of processing time after their last
    * update — `TTLConfig`, the retention-bound knob every production
    * stateful job sets first (the §2.I surface the r12 verdict ranked
    * top of the remaining API gaps). Each emission carries the PRIOR
    * state the batch found alongside the updated total, so expiry is
    * observable in the output: a batch that runs after the TTL has
    * passed finds prior = 0, and a processor (or engine) that ignored
    * the TTL would emit the surviving count and hash-mismatch against
    * the oracle. TTL validates only in TimeMode.ProcessingTime
    * (StatefulProcessorHandleImplBase rejects it elsewhere).
    */
  private class TtlPhaseCount(ttlMs: Long)
      extends StatefulProcessor[Long, Long, (Long, Long, Long)] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    // input is the projected user_id alone — the fold only counts (r14)
    override def handleInputRows(user: Long, rows: Iterator[Long],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      val prior = if (n.exists()) n.get() else 0L
      val total = prior + rows.size
      n.update(total)
      Iterator((user, total, prior))
    }
  }

  /** The stateful pipe of `stream_stateful_count`, factored out so
    * StatefulRestartSpec drives the IDENTICAL logic through a
    * kill/restart cycle against a persistent checkpoint.
    */
  private[graft] def statefulCountPipe(ds: Dataset[Ev]): DataFrame = {
    import ds.sparkSession.implicits._
    // project to the grouping key BEFORE groupByKey (r14, guide §2.3):
    // the fold only counts rows, so the full-Ev scan/encode/shuffle was
    // 5× the bytes for zero information (the running_sum discipline)
    ds.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n_running")
  }

  /** The `transformWithState` pipe of `stream_tws_running_sum` (same
    * factoring rationale; requires the RocksDB state store provider).
    */
  private[graft] def twsRunningSumPipe(ds: Dataset[Ev]): DataFrame = {
    import ds.sparkSession.implicits._
    implicit val outEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    // project BEFORE groupByKey (r12): a typed groupByKey lambda is
    // opaque to the optimizer, so grouping raw Ev rows scans, encodes
    // and shuffles all 5 columns when the processor reads 2 — the
    // relational select restores column pruning at the parquet scan
    // and ~halves the bytes through the shuffle and the per-row
    // encoder work. Same discipline as the batch side's "never
    // shuffle what you don't aggregate".
    ds.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningCents, TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "cents_running")
  }


  // source chunk layouts that the CHECKPOINTED sink depends on are
  // written once per JVM via TempDirs.writeOnce: rewriting them with
  // fresh part file names would make the checkpoint see "new" files
  // and reprocess — the exactly-once guarantee is per stable input file
  private def writeOnce(key: String)(w: => Unit): Unit =
    graft.TempDirs.writeOnce(key)(w)

  /** Run ONE Trigger.AvailableNow pass of a file-source pipeline into a
    * checkpointed parquet sink: consumes whatever files under `srcDir`
    * the checkpoint has not seen yet as a single micro-batch, runs the
    * trailing no-data batch (watermark advancement + append-mode window
    * emission), and terminates. Calling it again after MORE files land
    * in `srcDir` resumes from the same checkpoint with the recovered
    * watermark — which makes micro-batch boundaries exactly as
    * controllable as the MemoryStream feeds this replaced, with no
    * driver-side collect anywhere (r3's `evSet` fed these replays
    * through a whole-table `collect()` — a scale-killer flagged in
    * VERDICT r3).
    */
  private def runFilePass(s0: SparkSession, srcDir: String, outDir: String)(
      pipe: Dataset[Ev] => DataFrame): Unit = {
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val src = s.readStream
      .schema(Encoders.product[Ev].schema)
      .parquet(srcDir)
      .as[Ev]
    val q = pipe(src)
      .writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** Plain two-file event layout for file-source replays (written once
    * per JVM, distributed write — never through the driver). Queries
    * replaying from it must be chunking-independent: file pickup order
    * within AvailableNow is not contractual.
    */
  private def plainEventsDir(s: SparkSession, d: String): String = {
    val dir = graft.TempDirs.scoped("stream_src_plain", d)
    graft.TempDirs.writeOnce("stream_src_plain" + d) {
      events(s, d)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .repartition(2, pmod(col("event_id"), lit(2)))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** Run a FILE-SOURCE streaming pipeline to completion (Trigger
    * .AvailableNow terminates when the backlog drains) into a memory
    * sink. Unlike the MemoryStream replays this never collects the
    * input to the driver — the scale path, where the "stream" is a
    * directory an upstream job appends to.
    *
    * NO maxFilesPerTrigger (r10): under AvailableNow in Spark 4.1 the
    * option produced a dead EMPTY batch 0 followed by ALL files in
    * batch 1 — an extra ~0.5 s of trigger/state-commit overhead per
    * replay with zero actual file splitting (instrumented with a
    * StreamingQueryListener; `durationMs` put ~0.45 s of addBatch on
    * the 0-row batch). Every pipeline routed through here is
    * chunking-independent by contract (monotone Update emissions or
    * Complete mode), so batch granularity was never load-bearing;
    * cross-batch state persistence is exercised by the two-pass
    * checkpoint-resume queries and StatefulRestartSpec, which manage
    * their own epochs.
    */
  /** One cached replay child session per (parent, provider) — the
    * asofSession pattern: the child is a fixed execution environment
    * (2 shuffle partitions, optional RocksDB provider), so rebuilding
    * SessionState per replay invocation was pure fixed cost. Memory
    * sink table names are per-operator, so sharing one session across
    * replays cannot collide.
    */
  // keyed by the PARENT session itself, value = children keyed by
  // (rocksdb?, shuffle partitions): a WeakHashMap key must be
  // externally referenced to survive, and a (session, flag) tuple key
  // is owned only by the map — it would be collected at the next GC
  // and silently degrade the cache back to one session per call
  // (caught in the r10 self-review). The partition count joined the
  // key in r11: stream_stream_join's 4-store-per-partition join wants
  // 4 partitions while the keyed replays' optimum is 2, and a shared
  // session's conf cannot serve both without racing.
  private val replaySessions =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(Boolean, Int, Boolean), SparkSession]]
  private def replaySession(s0: SparkSession, rocksDb: Boolean,
                            partitions: Int = 2,
                            noDataBatches: Boolean = true): SparkSession =
    replaySessions.synchronized {
      var byFlag = replaySessions.get(s0)
      if (byFlag == null) {
        byFlag = scala.collection.mutable.Map
          .empty[(Boolean, Int, Boolean), SparkSession]
        replaySessions.put(s0, byFlag)
      }
      var s = byFlag.getOrElse((rocksDb, partitions, noDataBatches), null)
      if (s == null) {
        s = s0.newSession()
        // 2 shuffle partitions, not 4 (r10): state store instances are
        // per (stateful operator, partition) and the replays' key
        // counts need no more parallelism; results are key-grouped
        // aggregates, partitioning-invariant by construction (the
        // invariance the adversarial-repartition specs pin). r11
        // probed 1 partition: WORSE (replay-9 total 9.95 → 10.91 s —
        // the data-proportional states, stream_dedup's 600k ids above
        // all, lose more to serial execution than the saved state
        // store open/commit returns). 2 is the measured optimum.
        s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
        // most replays provably gain nothing from the trailing no-data
        // micro-batch (Update/Complete modes, or append operators that
        // emit on arrival — dedup, inner stream-stream join): it only
        // advances the watermark and pays a full state-store
        // open/commit cycle per stateful partition (probe: 0.2-0.7 s).
        // Queries whose OUTPUT is produced by watermark movement
        // (timer expiry, append-mode windowed aggs) must keep it.
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          noDataBatches.toString)
        if (rocksDb) { // transformWithState requires RocksDB
          s.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          // ONE shared RocksDB block cache + write-buffer manager
          // across every instance on the executor (r13 VERDICT task 5
          // — "one shared provider" in the form Spark actually
          // exposes): without bounded memory each tws replay's store
          // instances allocate private caches; with it they share a
          // single LRU arena sized far above these replays' KB-scale
          // states, so the setting only dedups allocations — it can
          // never evict a working set at this scale
          s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
            ".boundedMemoryUsage", "true")
          s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
            ".maxMemoryUsageMB", "256")
          // changelog checkpointing: each commit uploads the batch's
          // delta instead of zipping the full RocksDB instance — the
          // production default, and it shaves the per-batch commit
          s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
            ".changelogCheckpointing.enabled", "true")
          // every commit otherwise COUNTS the whole store to report
          // numTotalStateRows — an O(state) scan paid per batch for a
          // progress metric none of these replays read (r11 floor cut;
          // the standard production toggle for large stateful queries)
          s.conf.set("spark.sql.streaming.stateStore.rocksdb" +
            ".trackTotalNumberOfRows", "false")
        }
        byFlag.put((rocksDb, partitions, noDataBatches), s)
      }
      s
    }

  /** Memory-sink names must be unique per INVOCATION now that replays
    * share a session: a fixed name would make two concurrent runs of
    * one operator collide on the StreamingQueryManager ("query with
    * that name is already active") or swap the memory table under an
    * in-flight read (r10 review).
    */
  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Partition count for the SMALL-KEYED stateful replays, env-tunable
    * for A/B probes (r13 VERDICT task 5). The hypothesis that 1
    * partition beats 2 by saving a state-store lifecycle was A/B'd
    * same-binary in r14: family second-pass totals 13.9 s (parts=1) vs
    * 12.4 s (parts=2) — the serial 100k-row addBatch fold loses more
    * than the saved open/commit returns, re-confirming the r11
    * all-replays probe at per-query granularity. Default stays 2 (the
    * measured optimum); results are key-grouped aggregates,
    * partitioning-invariant by construction, so the knob is pure cost
    * either way.
    */
  private val keyedParts: Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse(2)

  /** Consolidated checkpoint root for the replay family (r11 verdict
    * #2): one RAM-filesystem base instead of a per-query temp dir on
    * the disk-backed /tmp. Every replay lifecycle pays an offset-log
    * write, a commit-log write and (RocksDB) a changelog upload into
    * its checkpoint — on ext4 those are fsync-bound, on tmpfs they are
    * memory writes. Each invocation still gets its OWN subdir (offsets
    * are per-query state; reusing one across runs would mark batch 0
    * committed and starve the next run's memory sink), deleted in the
    * same `finally` that stops the query, so the root never
    * accumulates. Production checkpoints go to durable storage by
    * definition — this root only serves the bench/verify replays,
    * and the parquet-sink restart queries keep their durable-disk
    * checkpoints (exactly-once across restart is their SEMANTICS).
    * Falls back to Spark's temp-checkpoint path when /dev/shm is
    * absent.
    */
  private val ckptBase: Option[String] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) {
      // PER-PROCESS base (r12 review): replaySeq restarts at 1 in
      // every JVM, so a fixed base would make a crashed run's leftover
      // checkpoint (its finally-delete never ran) or a concurrent
      // second JVM silently REUSE the same path — Spark would restore
      // the stale offset/commit log and starve or corrupt the memory
      // sink. pid + JVM start nanos make the base unique per process;
      // stale siblings from crashed runs are swept once per JVM when
      // older than 6h (best-effort — a concurrent sweep racing a
      // live run older than that cannot happen inside one bench run).
      val root = java.nio.file.Paths.get("/dev/shm/graft_ckpt")
      try {
        java.nio.file.Files.createDirectories(root)
        val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
        val ls = java.nio.file.Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala.foreach { p =>
            try {
              if (java.nio.file.Files
                    .getLastModifiedTime(p).toMillis < cutoff)
                graft.TempDirs.deleteRecursively(p)
            } catch { case _: java.io.IOException => () }
          }
        } finally ls.close()
      } catch { case _: java.io.IOException => () }
      Some(s"/dev/shm/graft_ckpt/p${ProcessHandle.current().pid()}" +
        s"_${java.lang.Long.toHexString(System.nanoTime())}")
    } else None
  }

  private def deleteTree(dir: String): Unit =
    graft.TempDirs.deleteRecursively(java.nio.file.Paths.get(dir))

  private def runFileStream(s0: SparkSession, name: String, dir: String,
                            mode: OutputMode, rocksDb: Boolean = false,
                            partitions: Int = 2,
                            noDataBatches: Boolean = true)(
                             pipe: Dataset[Ev] => DataFrame): DataFrame = {
    val s = replaySession(s0, rocksDb, partitions, noDataBatches)
    import s.implicits._
    val uname = s"${name}_${replaySeq.incrementAndGet()}"
    val src = s.readStream
      .schema(Encoders.product[Ev].schema)
      .parquet(dir)
      .as[Ev]
    val writer = pipe(src)
      .writeStream.format("memory").queryName(uname).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val ckpt = ckptBase.map(b => s"$b/$uname")
    ckpt.foreach(c => writer.option("checkpointLocation", c))
    val q = writer.start()
    try q.awaitTermination() finally {
      q.stop()
      ckpt.foreach(deleteTree)
    }
    // un-register the per-invocation memory table right away (ADVICE
    // r10): the cached replay session outlives every invocation, so
    // leaving name_N views behind accumulates every replay's result
    // rows in driver memory for the parent session's lifetime. The
    // returned DataFrame's plan already holds the resolved memory-sink
    // relation, so dropping the catalog name doesn't invalidate it —
    // it just stops the catalog pinning the rows once the caller lets
    // the DataFrame go.
    val out = s.table(uname)
    s.catalog.dropTempView(uname)
    out
  }

  val queries: Map[String, Q] = Map(
    // ---- batch forms of the windowed shapes (oracle-paired) ----

    // 1-hour tumbling count+sum by event_type via window().
    "stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySumD(col("value")).as("sum_val"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_val"))
        .orderBy(col("win_start_us"), col("event_type"))),

    // 1-hour window sliding every 15 minutes (4 windows per event).
    "stream_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts_ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), moneySumD(col("value")).as("sum_val"))
        .select(unix_micros(col("w.start")).as("win_start_us"), col("n"),
          col("sum_val"))
        .orderBy(col("win_start_us"))),

    // Session windows: 30-minute inactivity gap per user.
    "stream_session" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), moneySumD(col("value")).as("sum_val"))
        .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
          col("n"), col("sum_val"))
        .orderBy(col("user_id"), col("sess_start_us"))),

    // ---- real streaming executions (MemoryStream micro-batches) ----

    // Late-data handling: every 50th event (by id) is held back to a
    // second replay pass; by then the watermark has passed most of
    // them, so append-mode windows exclude them. ORACLE-PAIRED: the
    // batch boundaries are deterministic — pass 1 consumes the main
    // set as one micro-batch (single source file), pass 2 resumes the
    // SAME checkpoint and consumes the late set — so the drop set is a
    // pure function of the data: after pass 1 the watermark is
    // floor-to-ms(max main ts) - 10 min, so a late row only survives
    // if its window end exceeds that; and a window only EMITS (append
    // mode) if its end is <= the final watermark floor-to-ms(max all
    // ts) - 10 min. The paired SQL computes exactly that (parity
    // pinned by StreamingParitySpec; boundary note: window ends are
    // hour-aligned and watermarks ms-aligned, so the <= / <
    // distinction at exact-boundary collisions is sub-millisecond-
    // improbable). The whole replay — chunk layout, both passes, the
    // checkpointed parquet sink — runs once per JVM with distributed
    // reads/writes only (no driver collect); re-invocations restart
    // against the drained checkpoint and reread the identical sink,
    // the same exactly-once restart contract as stream_sink_parquet.
    "stream_watermark_late" -> ((s, d) => {
      val srcDir = graft.TempDirs.scoped("wmlate_src", d)
      val outDir = graft.TempDirs.scoped("wmlate_out", d)
      writeOnce("wmlate" + d) {
        // a PRIOR failed build (writeOnce records the key only on
        // success) may have left a half-committed checkpoint; resuming
        // against it would replay the rewritten source files as late
        // data against the recovered watermark and silently drop
        // windows — wipe both sink and checkpoint so a retry starts
        // from scratch
        graft.TempDirs.clearDir(outDir)
        val ev = events(s, d)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
        def pipe(ds: Dataset[Ev]): DataFrame =
          ds.withColumn("ts", timestamp_micros(col("ts_us")))
            .withWatermark("ts", "10 minutes")
            .groupBy(window(col("ts"), "1 hour").as("w"))
            .agg(count(lit(1)).as("n"))
            .select(unix_micros(col("w.start")).as("win_start_us"), col("n"))
        // one file per pass => one data micro-batch per pass: the
        // watermark cannot advance mid-set and drop on-time rows
        ev.filter(col("event_id") % 50 =!= 0).repartition(1)
          .write.mode("overwrite").parquet(srcDir)
        runFilePass(s, srcDir, outDir)(pipe)
        ev.filter(col("event_id") % 50 === 0).repartition(1)
          .write.mode("append").parquet(srcDir)
        runFilePass(s, srcDir, outDir)(pipe)
      }
      // schema-explicit read of a pre-created dir: an EMPTY event feed
      // means the sink never commits a file (or even creates the
      // path), and the degenerate-input contract is an empty result,
      // not a missing-path error
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$outDir/data"))
      s.read.schema("win_start_us BIGINT, n BIGINT")
        .parquet(s"$outDir/data")
        .select(col("win_start_us"), col("n"))
        .orderBy(col("win_start_us"))
    }),

    // Stateful streaming dedup over a FILE source: the doubled event
    // set is written as two parquet chunk files (a distributed write —
    // no driver collect anywhere on this path, unlike the MemoryStream
    // replays), streamed back one file per micro-batch, and
    // dropDuplicatesWithinWatermark keeps exactly one copy of each
    // event. The watermark delay exceeds the fixture's event-time span,
    // so no row is ever late-dropped regardless of which chunk file a
    // micro-batch picks first — the final distinct set is
    // order-independent and the result equals the batch per-type
    // counts, so this IS oracle-paired.
    "stream_dedup" -> ((s, d) => {
      val dir = graft.TempDirs.scoped("stream_src", d)
      // once per (JVM, input): the doubled layout is deterministic, so
      // re-invocations (bench run 2, repeated verify) replay the same
      // files instead of rewriting 2x the feed each time
      graft.TempDirs.writeOnce("stream_src" + d) {
        val ev = events(s, d)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
        ev.unionByName(ev)
          .repartition(2, pmod(col("event_id"), lit(2)))
          .write.mode("overwrite").parquet(dir)
      }
      runFileStream(s, "graft_sink_dedup", dir, OutputMode.Append(),
          noDataBatches = false) { ds =>
        // project to the dedup key + the downstream count column (r14,
        // guide §2.3): user_id/value never reach the state or the
        // type-count, so they only fattened the dedup shuffle and the
        // memory sink. Duplicate rows are byte-identical, so the
        // surviving (event_id → event_type) pairs are unchanged.
        ds.select(col("event_id"), col("ts_us"), col("event_type"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "240 hours")
          .dropDuplicatesWithinWatermark("event_id")
      }.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Arbitrary stateful per-user running aggregate via
    // flatMapGroupsWithState; the per-user count is monotone, so the max
    // over all Update-mode emissions is the final total — oracle-paired
    // against the batch GROUP BY.
    // File-source replay (no driver collect): per-user counts are
    // monotone, so the max over Update-mode emissions is the final
    // total regardless of which file a micro-batch picks first.
    "stream_stateful_count" -> ((s, d) => {
      val out = runFileStream(s, "graft_sink_state", plainEventsDir(s, d),
        OutputMode.Update(), partitions = keyedParts,
        noDataBatches = false)(statefulCountPipe)
      out.groupBy(col("user_id"))
        .agg(max(col("n_running")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // COMPLETE-mode leaderboard (r9): the third output mode —
    // stream_sink_parquet appends, stream_stateful_count updates, this
    // RE-EMITS the full aggregate every micro-batch (the live-dashboard
    // contract: each refresh replaces the whole board). The memory
    // sink's complete-mode table is the LAST full emission, so the
    // final read is the total aggregate regardless of file pickup
    // order — chunking-independence by the output mode's own
    // semantics, no watermark involved. Exact cents sums; top-3 slice
    // with a total-order tiebreak. At scale complete mode is only
    // viable because the result is |event_type|-bounded (a handful of
    // rows) — the state is the aggregate itself, never the input.
    "stream_topk_complete" -> ((s, d) => {
      val out = runFileStream(s, "graft_sink_topk",
        plainEventsDir(s, d), OutputMode.Complete(),
        partitions = keyedParts, noDataBatches = false) { src =>
        src.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"))
      }
      out.orderBy(col("n").desc, col("event_type").asc)
        .limit(3)
        .select(col("event_type"), col("n"), col("sum_cents"))
    }),

    // Stream-static enrichment join: each micro-batch of the event
    // stream broadcast-joins the static dimension table (no state, no
    // watermark needed — the canonical "enrich the feed" shape). The
    // user->nation mapping is a synthetic FK (user_id % 25) since the
    // fixtures carry no user dim; oracle-paired against the identical
    // batch join. Replays from a parquet FILE source (one file per
    // micro-batch, no driver collect — the scale path, like
    // stream_dedup); the pipe is stateless, so the result is
    // chunking-independent by construction.
    "stream_static_join" -> ((s, d) => {
      runFileStream(s, "graft_sink_enrich", plainEventsDir(s, d),
        OutputMode.Append(), partitions = keyedParts,
        noDataBatches = false) { ds => // stateless
        val dim = nation(ds.sparkSession, d)
          .select(col("n_nationkey"), col("n_name"))
        ds.join(broadcast(dim),
            pmod(col("user_id"), lit(25)).cast("int") === col("n_nationkey"))
          .select(col("event_id"), col("n_name"))
      }.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("n_name"))
    }),

    // Checkpointed parquet FILE SINK with exactly-once semantics: the
    // event chunks stream in one file per micro-batch and land in a
    // parquet sink under a real checkpoint. Because the source layout
    // is written ONCE per JVM and the checkpoint + sink live in stable
    // scoped dirs, re-invoking this query re-starts the stream against
    // the same checkpoint: the restart finds no unprocessed files and
    // the sink is byte-identical — the exactly-once restart contract,
    // asserted in StreamingParitySpec. (This is the production sink
    // shape; the memory sinks elsewhere are test harness only.)
    // CDC upsert sink via foreachBatch (r6): maintain a keyed serving
    // table ("latest state per user") from a changelog feed — THE
    // production pattern for landing a stream into a table format that
    // has no streaming MERGE of its own. Each micro-batch reduces to
    // its per-key latest row (max over the (ts_us, event_id) total
    // order), merges with the prior table version, and writes a NEW
    // versioned parquet snapshot — versions make the write idempotent
    // under batch replay (a failed batch overwrites its own version,
    // never corrupts the prior one), mirroring how transactional
    // table formats commit. The per-key latest-wins merge is an
    // associative, commutative max, so the final table is provably
    // independent of file pickup order and micro-batch chunking
    // (maxFilesPerTrigger=1 keeps MULTIPLE real merge rounds — the
    // versioned-merge semantics this operator exists to exercise, so
    // the option stays here even though the shared replay harness
    // dropped it). State
    // versions are serving-table-sized (|keys| rows), not feed-sized;
    // at 100 TB the same loop lands on a MERGE-capable table format
    // (the §2.M boundary) instead of full-snapshot rewrites.
    "stream_foreachbatch_upsert" -> ((s0, d) => {
      val srcDir = graft.TempDirs.scoped("fbusrc", d)
      writeOnce("fbusrc" + d) {
        events(s0, d)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
          .repartition(4, pmod(col("event_id"), lit(4)))
          .write.mode("overwrite").parquet(srcDir)
      }
      // cached replay session (r14 — this and stream_sink_parquet were
      // the last two replays paying a fresh SessionState rebuild per
      // invocation; the durable checkpoint/sink dirs are scoped paths,
      // untouched by which session runs the query)
      val s = replaySession(s0, rocksDb = false, partitions = 4,
        noDataBatches = false)
      val outDir = graft.TempDirs.scoped("fbuout", d)
      val dataRoot = s"$outDir/state"
      def versions(): Seq[Long] = {
        val p = java.nio.file.Paths.get(dataRoot)
        if (!java.nio.file.Files.exists(p)) Seq.empty
        else {
          val st = java.nio.file.Files.list(p)
          try {
            import scala.jdk.CollectionConverters._
            st.iterator().asScala.toSeq.map(_.getFileName.toString)
              .filter(_.startsWith("v")).map(_.drop(1).toLong)
          } finally st.close()
        }
      }
      def reduceLatest(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"))
        .agg(max(struct(col("last_ts_us"), col("last_event_id"),
          col("last_value"))).as("m"))
        .select(col("user_id"), col("m.last_ts_us").as("last_ts_us"),
          col("m.last_event_id").as("last_event_id"),
          col("m.last_value").as("last_value"))
      val q = s.readStream
        .schema(Encoders.product[Ev].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val latest = reduceLatest(batch
            .select(col("user_id"), col("ts_us").as("last_ts_us"),
              col("event_id").as("last_event_id"),
              col("value").as("last_value")))
          // merge from the max version STRICTLY BELOW this batch id:
          // a replayed batch (failed before its checkpoint commit)
          // must read its PREDECESSOR, not the version it is about to
          // overwrite — reading and overwriting the same v$batchId dir
          // would either throw (cannot overwrite a path being read /
          // partial files) or silently drop keys, and nothing would
          // ever clear the poisoned state (r7 review)
          val merged = versions().filter(_ < batchId).maxOption match {
            case Some(v) =>
              reduceLatest(s.read.parquet(s"$dataRoot/v$v")
                .unionByName(latest))
            case None => latest
          }
          merged.write.mode("overwrite").parquet(s"$dataRoot/v$batchId")
          ()
        }
        .option("checkpointLocation", s"$outDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      s.read.parquet(s"$dataRoot/v${versions().max}")
        .orderBy(col("user_id"))
    }),

    "stream_sink_parquet" -> ((s0, d) => {
      // the shared once-per-JVM source layout (identical content and
      // chunking to a private staging — r7 review dropped the
      // duplicate rewrite); writeOnce stability is exactly the
      // never-rewritten property the checkpointed sink needs
      val srcDir = plainEventsDir(s0, d)
      // cached replay session (r14, see stream_foreachbatch_upsert)
      val s = replaySession(s0, rocksDb = false, partitions = 4,
        noDataBatches = false)
      import s.implicits._
      val outDir = graft.TempDirs.scoped("sinkout", d)
      val q = s.readStream
        .schema(Encoders.product[Ev].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir).as[Ev]
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            * 100).cast("long").as("cents"))
        .writeStream.format("parquet")
        .option("path", s"$outDir/data")
        .option("checkpointLocation", s"$outDir/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      // schema-explicit read of a pre-created dir (see
      // stream_watermark_late): a feed with no purchases commits no
      // sink file, and the contract is an empty aggregate, not a
      // missing-path error
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$outDir/data"))
      s.read.schema("event_id BIGINT, user_id BIGINT, cents BIGINT")
        .parquet(s"$outDir/data")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("user_id"))
    }),

    // Stream-stream time-bounded inner join: click->purchase
    // attribution — every purchase within 10 minutes after a click by
    // the same user. The canonical two-feed join: both sides carry
    // watermarks and the join predicate bounds event-time distance, so
    // the state store provably evicts rows older than
    // watermark - bound (at cluster scale state is ∝ traffic within
    // the bound, not the stream's history). Both feeds replay from
    // parquet FILE sources (one filtered distributed write each, no
    // driver collect) staged fully before the stream starts: with no
    // file-per-trigger limit, Trigger.AvailableNow takes every file of
    // both sides into micro-batch 1, watermarks are still at epoch
    // while it runs, and the inner join emits exactly the complete
    // predicate-satisfying pair set — deterministic regardless of file
    // pickup order, oracle-paired against the identical batch
    // self-join.
    "stream_stream_join" -> ((s0, d) => {
      val clickDir = graft.TempDirs.scoped("ssj_clicks", d)
      val purchDir = graft.TempDirs.scoped("ssj_purch", d)
      writeOnce("ssj" + d) {
        val ev = events(s0, d)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
        ev.filter(col("event_type") === "click")
          .write.mode("overwrite").parquet(clickDir)
        ev.filter(col("event_type") === "purchase")
          .write.mode("overwrite").parquet(purchDir)
      }
      // the CACHED replay session (r11, was a fresh newSession per
      // invocation): rebuilding SessionState each run was ~0.4 s of
      // pure fixed cost. Partitions stay at 4 — an A/B at 2 measured
      // WORSE (the 40 k-row join work loses more parallelism than the
      // halved 4-stores-per-partition lifecycle returns) — and the
      // trailing watermark-eviction batch (probe: ~0.5-0.7 s of pure
      // store opens, zero output for an inner join that emits on
      // match) is disabled via noDataBatches = false. Unique sink
      // name + drop, as runFileStream.
      val s = replaySession(s0, rocksDb = false, partitions = 4,
        noDataBatches = false)
      import s.implicits._
      val uname = s"graft_sink_ssj_${replaySeq.incrementAndGet()}"
      def side(dir: String): Dataset[Ev] = s.readStream
        .schema(Encoders.product[Ev].schema)
        .parquet(dir)
        .as[Ev]
      val clicks = side(clickDir)
        .withColumn("click_ts", timestamp_micros(col("ts_us")))
        .withWatermark("click_ts", "1 hour")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("click_ts"))
      val purchases = side(purchDir)
        .withColumn("p_ts", timestamp_micros(col("ts_us")))
        .withWatermark("p_ts", "1 hour")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("p_ts"))
      val w = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("p_ts") >= col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"))
        .writeStream.format("memory").queryName(uname)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val ckpt = ckptBase.map(b => s"$b/$uname")
      ckpt.foreach(c => w.option("checkpointLocation", c))
      val q = w.start()
      try q.awaitTermination() finally { q.stop(); ckpt.foreach(deleteTree) }
      val out = s.table(uname)
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      s.catalog.dropTempView(uname)
      out
    }),

    // Same running-aggregate shape on the MODERN stateful API:
    // `transformWithState` + typed ValueState on the RocksDB state
    // store (Spark 4's replacement for [flat]mapGroupsWithState).
    // Exact integer cents keep it oracle-pairable; values are
    // non-negative so the running sum is monotone and the max over
    // Update-mode emissions is the final per-user total.
    // File-source replay; non-negative values make the running sum
    // monotone, so the max over emissions is chunking-independent.
    "stream_tws_running_sum" -> ((s, d) => {
      val out = runFileStream(s, "graft_sink_tws", plainEventsDir(s, d),
        OutputMode.Update(), rocksDb = true, partitions = keyedParts,
        noDataBatches = false)(twsRunningSumPipe)
      out.groupBy(col("user_id"))
        .agg(max(col("cents_running")).as("total_cents"))
        .orderBy(col("user_id"))
    }),

    // Initial state on transformWithState (r9): the state-MIGRATION
    // surface — per-user state bootstrapped from a BATCH table
    // (signup counts ×1000) before micro-batch 1, then the stream
    // (non-signup events, a disjoint staged source) increments on
    // top. The weighting proves the bootstrap is live: emitted score
    // = 1000·batch_signups + stream_events, which no stream-only
    // counting can produce. Running sums are monotone, so max over
    // Update emissions is final, chunking-independent. This is how a
    // production pipeline moves from batch to streaming without
    // replaying history — the state store starts where batch left
    // off.
    "stream_tws_initial_state" -> ((s0, d) => {
      val srcDir = graft.TempDirs.scoped("stream_src_nosignup", d)
      graft.TempDirs.writeOnce("stream_src_nosignup" + d) {
        events(s0, d)
          .filter(col("event_type") =!= "signup")
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
          .repartition(2, pmod(col("event_id"), lit(2)))
          .write.mode("overwrite").parquet(srcDir)
      }
      val out = runFileStream(s0, "graft_sink_twsinit", srcDir,
        OutputMode.Update(), rocksDb = true, partitions = keyedParts,
        noDataBatches = false) { ds =>
        import ds.sparkSession.implicits._
        implicit val outEnc: Encoder[(Long, Long)] =
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        val init = events(ds.sparkSession, d)
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id")).count()
          .as[(Long, Long)]
          .groupByKey(_._1).mapValues(_._2)
        ds.select(col("user_id")).as[Long]
          .groupByKey(identity)
          .transformWithState(new WarmStartCount, TimeMode.None(),
            OutputMode.Update(), init)
          .toDF("user_id", "score")
      }
      out.groupBy(col("user_id"))
        .agg(max(col("score")).as("score"))
        .orderBy(col("user_id"))
    }),

    // ListState on transformWithState (r9): per-user last-3 events by
    // (event time, id) on RocksDB — bounded per-key retention, the
    // feature-serving/session-replay state shape. The top-k merge is
    // associative (chunking-independent final state) and emissions
    // are positionally monotone, so the lexicographic MAX over
    // Update emissions is the final answer — mirrored by the oracle's
    // per-user rank-3 window.
    "stream_tws_list_recent" -> ((s, d) => {
      val out = runFileStream(s, "graft_sink_twslist", plainEventsDir(s, d),
        OutputMode.Update(), rocksDb = true, partitions = keyedParts,
        noDataBatches = false) { ds =>
        import ds.sparkSession.implicits._
        implicit val outEnc: Encoder[(Long, Seq[Long])] =
          Encoders.product[(Long, Seq[Long])]
        ds.select(col("user_id"), col("ts_us"), col("event_id"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new RecentTop3, TimeMode.None(),
            OutputMode.Update())
          .toDF("user_id", "top3")
      }
      // Lexicographic MAX picks the final (complete) emission per user;
      // the array is then flattened to a comma-joined string because the
      // driver comparator hashes scalar columns only (r9 lesson: a raw
      // ArrayType column kills the pandas sort/factorize path).
      out.groupBy(col("user_id"))
        .agg(max(col("top3")).as("top3_arr"))
        .select(col("user_id"),
          array_join(transform(col("top3_arr"),
            x => x.cast("string")), ",").as("top3"))
        .orderBy(col("user_id"))
    }),

    // MapState on transformWithState (r9): per-user event_type →
    // count map on RocksDB — the keyed-sub-state API surface (one
    // state row per (grouping key, map key) in the store, so a
    // user's map never materializes except when iterated). Replayed
    // file-source; per-(user, type) max over Update emissions is the
    // final count (monotone), chunking-independent.
    "stream_tws_map_counts" -> ((s, d) => {
      val out = runFileStream(s, "graft_sink_twsmap", plainEventsDir(s, d),
        OutputMode.Update(), rocksDb = true, partitions = keyedParts,
        noDataBatches = false) { ds =>
        import ds.sparkSession.implicits._
        implicit val outEnc: Encoder[(Long, String, Long)] =
          Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
            Encoders.scalaLong)
        ds.select(col("user_id"), col("event_type")).as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new TypeCounts, TimeMode.None(),
            OutputMode.Update())
          .toDF("user_id", "event_type", "n_running")
      }
      out.groupBy(col("user_id"), col("event_type"))
        .agg(max(col("n_running")).as("n_events"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Event-time TIMERS on transformWithState (r9): per-user
    // inactivity close — totals are EMITTED BY THE WATERMARK passing
    // the user's 30-min inactivity timer, not by rows arriving (the
    // session-timeout/SLA-alarm primitive; TimeMode.EventTime +
    // registerTimer/handleExpiredTimer, the Spark 4 replacement for
    // mapGroupsWithState's setTimeoutTimestamp). Replayed as ONE
    // AvailableNow batch (the stream_stream_join discipline) so every
    // row folds into state before any watermark movement, then the
    // trailing no-data batch advances the watermark to
    // global-max − 10 min and fires exactly the timers at or before
    // it: emitted = users whose last activity is ≥ 30 min before
    // that watermark, each with complete totals — deterministic
    // regardless of file pickup. Users active near stream end stay
    // open (their timer is beyond the final watermark): exactly the
    // semantics a live pipeline has, and the oracle reproduces the
    // threshold in ms watermark arithmetic.
    "stream_tws_timers" -> ((s0, d) => {
      // cached RocksDB replay session (r11, was a fresh newSession per
      // invocation — a pure SessionState-rebuild cost); this is the
      // one replay that MUST keep no-data micro-batches: its output is
      // produced by the trailing batch's watermark advance firing the
      // inactivity timers, not by rows arriving
      val s = replaySession(s0, rocksDb = true, partitions = keyedParts)
      import s.implicits._
      implicit val outEnc: Encoder[(Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong)
      val uname = s"graft_sink_timers_${replaySeq.incrementAndGet()}"
      val src = s.readStream
        .schema(Encoders.product[Ev].schema)
        .parquet(plainEventsDir(s0, d))
        // project to the fold's columns before the typed boundary
        // (r14, guide §2.3) — event_id/event_type never reach the
        // inactivity aggregate
        .select(col("ts_us"), col("user_id"), col("value"))
        .withColumn("ts_ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts_ts", "10 minutes")
        .as[EvT]
      val w = src.groupByKey(_.user_id)
        .transformWithState(new InactivityClose, TimeMode.EventTime(),
          OutputMode.Append())
        .toDF("user_id", "n_events", "sum_cents")
        .writeStream.format("memory").queryName(uname)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val ckpt = ckptBase.map(b => s"$b/$uname")
      ckpt.foreach(c => w.option("checkpointLocation", c))
      val q = w.start()
      try q.awaitTermination() finally { q.stop(); ckpt.foreach(deleteTree) }
      val out = s.table(uname).orderBy(col("user_id"))
      s.catalog.dropTempView(uname)
      out
    }),

    // State TTL on transformWithState (r13, r12 VERDICT task 5): the
    // retention knob of production stateful jobs — ValueState entries
    // expire 2 s of processing time after their update. Replay is two
    // AvailableNow passes against ONE checkpoint (the
    // stream_watermark_late epoch discipline): pass 1 streams the
    // even-event_id half and leaves per-user counts in state; a sleep
    // strictly longer than the TTL guarantees every entry is expired
    // (expiry anchors at pass 1's batch timestamp, the sleep starts
    // after that batch COMMITS, so wall ordering is deterministic —
    // no race with a slow box); pass 2 streams the odd half and each
    // user's batch finds prior = 0. Emissions carry (total, prior),
    // so the sink pins the semantics: per user exactly one row per
    // non-empty half, Σemitted = their full event count, Σprior = 0 —
    // a run where TTL failed to expire would emit prior = n_even and
    // hash-mismatch. One-time cost (passes + sleep) is writeOnce per
    // JVM; re-invocations read the committed sink.
    "stream_tws_ttl" -> ((s0, d) => {
      val srcDir = graft.TempDirs.scoped("ttl_src", d)
      val outDir = graft.TempDirs.scoped("ttl_out", d)
      writeOnce("ttl" + d) {
        // wipe a half-committed retry's sink+checkpoint (the wmlate
        // rationale: resuming against one would double-count)
        graft.TempDirs.clearDir(outDir)
        val ev = events(s0, d)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value"))
        def pass(): Unit = {
          // noDataBatches = false is LOAD-BEARING here, not a perf
          // trim: in TimeMode.ProcessingTime the operator's
          // shouldRunAnotherBatch is always true (a later batch could
          // expire more TTL state), so AvailableNow + no-data batches
          // enabled loops FOREVER (observed: 1297 empty micro-batches
          // before the r13 build killed it). TTL reads stay correct
          // without cleanup batches — expiry is checked against the
          // batch timestamp at state read, not applied by sweeps.
          val s = replaySession(s0, rocksDb = true, partitions = 4,
            noDataBatches = false)
          import s.implicits._
          implicit val outEnc: Encoder[(Long, Long, Long)] =
            Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
              Encoders.scalaLong)
          val src = s.readStream
            .schema(Encoders.product[Ev].schema)
            .parquet(srcDir)
            .select(col("user_id")).as[Long] // count-only fold (r14)
          val q = src.groupByKey(identity)
            .transformWithState(new TtlPhaseCount(2000L),
              TimeMode.ProcessingTime(), OutputMode.Append())
            .toDF("user_id", "emitted_n", "prior")
            .writeStream.format("parquet")
            .option("path", s"$outDir/data")
            .option("checkpointLocation", s"$outDir/ckpt")
            .outputMode(OutputMode.Append())
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
        }
        ev.filter(col("event_id") % 2 === 0).repartition(1)
          .write.mode("overwrite").parquet(srcDir)
        pass()
        // sleep > TTL: every pass-1 entry (expiry = pass-1 batch
        // timestamp + 2 s) is expired when pass 2's batch starts
        Thread.sleep(3000L)
        ev.filter(col("event_id") % 2 === 1).repartition(1)
          .write.mode("append").parquet(srcDir)
        pass()
      }
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$outDir/data"))
      s0.read.schema("user_id BIGINT, emitted_n BIGINT, prior BIGINT")
        .parquet(s"$outDir/data")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_emissions"),
          sum(col("emitted_n")).as("sum_emitted"),
          sum(col("prior")).as("sum_prior"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin,
    "stream_sliding" ->
      """SELECT ((epoch_us(ts) // 900000000) - i) * 900000000 AS win_start_us,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events, range(4) t(i)
        |GROUP BY 1 ORDER BY win_start_us""".stripMargin,
    // the event_id tiebreaker in both windows is load-bearing: with
    // duplicate (user, ts) rows (the sf1 fixture replicates events 10x
    // with ts kept), a bare ORDER BY tus leaves the tie group's order
    // vs the boundary-flag row unspecified and DuckDB can split the
    // ties across two sessions — Spark's session_window never does
    // (same convention as the ts_sessionize / ts_session_window
    // oracles; found by the r11 full-sf1 oracle sweep)
    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |), l AS (
        |  SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS pt FROM e
        |), s AS (
        |  SELECT *, sum(CASE WHEN pt IS NULL OR tus - pt >= 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM l)
        |SELECT user_id, min(tus) AS sess_start_us, count(*) AS n, CAST(sum(v) AS DOUBLE) AS sum_val
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_stateful_count" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // complete mode's last emission IS the total aggregate
    "stream_topk_complete" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(18,0)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, event_type ASC LIMIT 3""".stripMargin,
    "stream_tws_running_sum" ->
      """SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // one emission per non-empty event_id-parity half (the two
    // replay passes), full count across both, and zero surviving
    // prior state — the TTL-expiry arithmetic in batch form
    "stream_tws_ttl" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_id % 2 = 0) > 0 AS BIGINT)
        |  + CAST(count(*) FILTER (WHERE event_id % 2 = 1) > 0 AS BIGINT)
        |    AS n_emissions,
        |  count(*) AS sum_emitted,
        |  0::BIGINT AS sum_prior
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_static_join" ->
      """SELECT n_name, count(*) AS n_events
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // Latest-wins over the (ts, event_id) total order — the stream's
    // 4-round merge must land on the same per-key argmax the batch
    // window computes in one pass (row_number, not arg_max: this
    // DuckDB has no list-keyed arg_max overload — the
    // ts_resample_ohlc precedent).
    "stream_foreachbatch_upsert" ->
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, tus AS last_ts_us, event_id AS last_event_id,
        |  value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // users with >= 1 non-signup event, scored 1000·signups + rest —
    // the exact warm-start algebra
    "stream_tws_initial_state" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS ns FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), o AS (
        |  SELECT user_id, count(*) AS nn FROM events
        |  WHERE event_type <> 'signup' GROUP BY user_id
        |)
        |SELECT o.user_id,
        |  CAST(1000 * coalesce(s.ns, 0) + o.nn AS BIGINT) AS score
        |FROM o LEFT JOIN s USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // per-user rank-3 window, flattened in the same (ts desc, id
    // desc) order the processor emits, comma-joined to a scalar string
    // so the driver comparator can hash it (matches the engine side)
    "stream_tws_list_recent" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
        |), r AS (
        |  SELECT user_id, tus, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY tus DESC, event_id DESC) AS rn
        |  FROM e
        |)
        |SELECT user_id,
        |  array_to_string(flatten(list([tus, event_id]
        |    ORDER BY tus DESC, event_id DESC)), ',') AS top3
        |FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_tws_map_counts" ->
      """SELECT user_id, event_type, count(*) AS n_events FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // the timer threshold in the same ms watermark arithmetic the
    // engine uses: watermark = global max (ms) − 10 min; a user's
    // inactivity timer (last activity ms + 30 min) fires iff it is at
    // or before that watermark, emitting the COMPLETE per-user totals
    "stream_tws_timers" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |), mx AS (
        |  SELECT max(tus) // 1000 - 600000 AS wm_ms FROM e
        |), u AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(CAST(v * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |    max(tus) // 1000 AS umax_ms
        |  FROM e GROUP BY user_id
        |)
        |SELECT user_id, n_events, sum_cents
        |FROM u, mx WHERE umax_ms + 1800000 <= wm_ms
        |ORDER BY user_id""".stripMargin,
    "stream_sink_parquet" ->
      """SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) AND epoch_us(c.ts) + 600000000
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "stream_watermark_late" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
        |mx AS (SELECT ((max(tus) FILTER (WHERE event_id % 50 <> 0)) // 1000 - 600000) * 1000 AS wmain,
        |              ((max(tus)) // 1000 - 600000) * 1000 AS wall FROM e),
        |w AS (
        |  SELECT (tus // 3600000000) * 3600000000 AS ws,
        |    count(*) FILTER (WHERE event_id % 50 <> 0) AS n_main,
        |    count(*) FILTER (WHERE event_id % 50 = 0) AS n_late
        |  FROM e GROUP BY 1
        |)
        |SELECT ws AS win_start_us,
        |  n_main + CASE WHEN ws + 3600000000 > (SELECT wmain FROM mx) THEN n_late ELSE 0 END AS n
        |FROM w
        |WHERE ws + 3600000000 <= (SELECT wall FROM mx)
        |  AND n_main + CASE WHEN ws + 3600000000 > (SELECT wmain FROM mx) THEN n_late ELSE 0 END > 0
        |ORDER BY win_start_us""".stripMargin
  )
}
