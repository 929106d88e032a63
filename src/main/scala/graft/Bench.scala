package graft

import graft.model.EngineConf
import graft.sources.Generator
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Two phases, mirroring the reference's methodology (README.md
  * benchmark modes: produce = generate+serialize+send, consume =
  * fetch+[deserialize]; warm-up excluded — SURVEY.md §6):
  *
  *  1. serde — the reference's workload shape (100 000 × ~1 KB
  *     messages): produce avro/json to files, consume back in
  *     E2E_PARSE and TRANSPORTE modes; reported as msg/s next to the
  *     reference's 6 253.95 msg/s README number.
  *  2. queries — headline relational + llmops queries on
  *     SPARK_GRAFT_SF_DIR, each materialized through the noop sink
  *     (full execution, zero sink cost — `.count()` would let Catalyst
  *     prune the plan to a metadata scan).
  *
  * SELF-DIAGNOSING (round-2 verdict #1: the driver's numbers ran
  * 3-13× the builder's same-config measurements, and a single cold
  * pass cannot say why). Every entry is measured as ONE untimed warm
  * pass + `SPARK_GRAFT_BENCH_PASSES` (≥3) timed passes; the headline
  * number is the MIN of the timed passes (round-13 verdict #1: the
  * min is the least-contended observation — a contended box turns
  * medians into false regressions; the median rides in
  * `queries_median` + per-entry detail) and the JSON carries the
  * full `{warm, timed[]}` detail per entry, so the variance source is
  * readable from the artifact itself:
  *   warm ≈ timed       → steady-state cost (environment if still slow)
  *   warm ≫ timed       → one-time build (cache/layout/JIT) dominated
  *   timed high-variance → box contention during the run
  * `shingle_index_hit` additionally reports whether any TIMED pass
  * rebuilt the persisted shingle index (it never should — a miss means
  * the timed number includes a build cost steady state would not pay).
  */
object Bench {

  /** Locale-fixed number formatting (the f-interpolator honors the
    * JVM default locale and would emit comma decimals — invalid JSON). */
  private def jnum(v: Double, places: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Execute the full plan with no sink cost. */
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  final case class Timing(warm: Double, timed: Seq[Double]) {
    def median: Double = {
      val s = timed.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    /** Steady-state cost under contention: the box can only make a
      * pass SLOWER, never faster, so the min is the least-contended
      * observation (round-3 verdict #3 — a median of 3 under 3× pass
      * spreads is a coin flip). Reported next to the median. */
    def min: Double = if (timed.isEmpty) -1.0 else timed.min
  }

  /** One warm pass + `passes` timed passes. */
  private def measure(passes: Int)(go: () => Unit): Timing = {
    val warm = time(go())
    Timing(warm, (1 to passes).map(_ => time(go())))
  }

  /** Steal seconds in the MIN pass above which that pass is considered
    * contaminated and extra passes are run (round-14 verdict #7: sq8's
    * min-based headline still inflated +39% under 37.9 s of measured
    * hypervisor steal across its timed passes — a min is only
    * steal-robust if at least one pass ran steal-clean). */
  private[graft] val StealRetrySec = 0.5
  private val MaxStealRetries = 2

  /** The fully-instrumented measurement of one bench entry: one warm
    * pass + `passes` timed passes (+ steal retries), with every
    * attribution signal captured per window — artifact-cache deltas
    * with measured build seconds (round-14 verdict #1), timed-window
    * steal (round-14 ADVICE), per-pass task clocks and steal, pressure
    * evictions net of explicit unpersists, probes, GC, block-layer
    * reads — and the mechanical `cause_class`. Shared by phase 2 and
    * the codec sweep so every entry in the artifact self-labels. */
  private def timeEntry(spark: SparkSession, passes: Int)(
      go: () => Unit): (Timing, EntryStats) = {
    val (memStart, diskStart) = storageBytes(spark)
    val snapStart = cacheMissSnapshot()
    val artStart = artifactSnapshot()
    val gcStart = gcMillis()
    val loadStart = load1()
    val stealStart = stealJiffies()
    val probeStart = probeMs()
    val rbStart = readBytes()
    val (evStart, _) = EvictionClock.snapshot()
    val (trStart, tcStart) = TaskClock.snapshot()
    val warm = time(go())
    val snapWarm = cacheMissSnapshot()
    val artWarm = artifactSnapshot()
    val gcWarm = gcMillis()
    val rbWarm = readBytes()
    val (evWarm, _) = EvictionClock.snapshot()
    val prWarm = EvictionClock.pressureSnapshot()
    val (trWarm, tcWarm) = TaskClock.snapshot()
    // round-14 ADVICE: the steal window compared against timed-pass
    // inflation starts AFTER the warm pass — warm-pass steal used to
    // satisfy the ≥25% threshold and mislabel timed inflation "steal"
    val stealWarm = stealJiffies()
    val probeMid = probeMs()
    // per-PASS executor clocks (round-13 verdict #2) + per-pass steal
    // (round-14 verdict #7): the cause classifier compares the worst
    // wall pass against the best one, and the retry logic needs to
    // know whether the MIN pass itself ran under steal. Async listener
    // delivery can shift a straggling task-end into the next pass's
    // delta — acceptable at the ≥1.5× ratios the classifier reads.
    def onePass(): (Double, Double, Double, Double) = {
      val (rp0, cp0) = TaskClock.snapshot()
      val sj0 = stealJiffies()
      val w = time(go())
      val (rp1, cp1) = TaskClock.snapshot()
      val sj1 = stealJiffies()
      (w, (rp1 - rp0) / 1e3, (cp1 - cp0) / 1e9,
        if (sj0 < 0 || sj1 < 0) -1.0 else (sj1 - sj0) / 100.0)
    }
    var passData = (1 to passes).map(_ => onePass()).toVector
    var retries = 0
    def minPassSteal: Double =
      passData(passData.indices.minBy(passData(_)._1))._4
    while (minPassSteal > StealRetrySec && retries < MaxStealRetries) {
      passData :+= onePass()
      retries += 1
    }
    val timed = passData.map(_._1)
    val snapTimed = cacheMissSnapshot()
    val artTimed = artifactSnapshot()
    val gcTimed = gcMillis()
    val rbTimed = readBytes()
    val (evTimed, _) = EvictionClock.snapshot()
    val prTimed = EvictionClock.pressureSnapshot()
    val (trTimed, tcTimed) = TaskClock.snapshot()
    val probeEnd = probeMs()
    val loadEnd = load1()
    val stealEnd = stealJiffies()
    val warmM = missDelta(snapStart, snapWarm)
    val timedM = missDelta(snapWarm, snapTimed)
    val artsWarm = artifactDelta(artStart, artWarm)
    val artsTimed = artifactDelta(artWarm, artTimed)
    val stealAll =
      if (stealStart < 0 || stealEnd < 0) -1.0
      else (stealEnd - stealStart) / 100.0
    val stealTimedSec =
      if (stealWarm < 0 || stealEnd < 0) -1.0
      else (stealEnd - stealWarm) / 100.0
    val rebuildSecTimed = artsTimed.map(_.buildSec).sum
    val st = EntryStats(memStart, diskStart,
      (gcWarm - gcStart) / 1000.0, (gcTimed - gcWarm) / 1000.0,
      warmM, timedM, loadStart, loadEnd, stealAll,
      probeStart, probeMid, probeEnd,
      ioDelta(rbStart, rbWarm), ioDelta(rbWarm, rbTimed),
      (trWarm - trStart) / 1e3, (trTimed - trWarm) / 1e3,
      (tcWarm - tcStart) / 1e9, (tcTimed - tcWarm) / 1e9,
      passData.map(_._2), passData.map(_._3),
      evWarm - evStart, evTimed - evWarm,
      causeClass(timed, passData.map(_._2), passData.map(_._3),
        stealTimedSec, probeMid, probeEnd, probeBaselineMs,
        prTimed - prWarm, rebuildSecTimed),
      artifactsWarm = artsWarm, artifactsTimed = artsTimed,
      stealTimedSec = stealTimedSec, stealPasses = passData.map(_._4),
      pressureEvictedTimed = prTimed - prWarm,
      retryPasses = retries)
    (Timing(warm, timed), st)
  }

  /** Per-cache miss counters by short name — the round-7 verdict's
    * ask: run-level booleans were too coarse to say WHICH artifact a
    * slow entry rebuilt (q92's 12.9 s driver anomaly was undiagnosable
    * from `artifact_cache_hit: true` alone). Every entry's detail now
    * carries its own warm/timed miss deltas from this snapshot. */
  private def cacheMissSnapshot(): Map[String, Long] = Map(
    "shingle" -> graft.llmops.TextOps.shingleCacheStats._2,
    "shingleDf" -> graft.llmops.TextOps.dfShingleCacheStats._2,
    "label" -> graft.llmops.TextOps.labelCacheStats._2,
    "sig" -> graft.llmops.TextOps.sigCacheStats._2,
    "pair" -> graft.llmops.TextOps.pairCacheStats._2,
    "neardup" -> graft.llmops.TextOps.neardupCacheStats._2,
    "pairCount" -> graft.llmops.TextOps.pairCountCacheStats._2,
    "incrNear" -> graft.llmops.TextOps.incrNearCacheStats._2,
    "bpe" -> graft.llmops.TextOps.bpeCacheStats._2,
    "dupGram" -> graft.llmops.TextOps.dupGramCacheStats._2,
    "q51hot" -> graft.queries.Queries.q51HotCacheStats._2,
    "sweep" -> graft.queries.RelOps.sweepCacheStats._2,
    "auc" -> graft.queries.RelOps.aucCacheStats._2,
    "codebook" -> graft.llmops.VectorOps.codebookCacheStats._2,
    "cosPair" -> graft.llmops.VectorOps.cosPairCacheStats._2,
    "exactTopk" -> graft.llmops.VectorOps.exactTopkCacheStats._2,
    "codeTopk" -> graft.llmops.VectorOps.codeTopkCacheStats._2,
    "lshPair" -> graft.llmops.VectorOps.lshPairCacheStats._2,
    "ivfCert" -> graft.llmops.VectorOps.ivfCertCacheStats._2)

  /** Round-14 verdict #1: the per-NAME miss counters above say an
    * artifact rebuilt, but not what the rebuild COST — q220's min grew
    * 41% (320→451 task-s) and q53's 5× with no code change to either,
    * and both classified "clean" because the run-wide hit flags can't
    * land a shared artifact's rebuild on the entry that paid for it.
    * The PlanCache registry snapshot carries (hits, misses, cumulative
    * build seconds) for EVERY cache — including ones the hand-wired
    * short-name list above never knew (pack_parted, bucketed_tables,
    * km_codes…) — and the per-entry deltas below become
    * `{built, hit, build_sec}` rows in the bench detail. */
  private def artifactSnapshot(): Map[String, (Long, Long, Double, Long)] =
    graft.operators.PlanCache.allStats

  private[graft] final case class ArtifactDelta(
      name: String, built: Long, hit: Long, buildSec: Double,
      published: Long = 0L)

  /** Per-cache activity between two registry snapshots; caches that
    * first registered inside the window read against zero. Only caches
    * with any activity (a hit, a build, or a stored publish) appear —
    * steady state reads as hits, a rebuild carries its measured build
    * seconds, and a producer-rule entry marks the artifact it
    * published (whose job cost ran inside this entry's own passes). */
  private[graft] def artifactDelta(
      before: Map[String, (Long, Long, Double, Long)],
      after: Map[String, (Long, Long, Double, Long)]): Seq[ArtifactDelta] =
    after.toSeq.flatMap { case (k, (h, m, b, p)) =>
      val (h0, m0, b0, p0) = before.getOrElse(k, (0L, 0L, 0.0, 0L))
      if (m - m0 > 0 || h - h0 > 0 || p - p0 > 0)
        Some(ArtifactDelta(k, m - m0, h - h0, math.max(b - b0, 0.0), p - p0))
      else None
    }.sortBy(_.name)

  /** Per-entry telemetry captured around the warm and timed passes:
    * which artifact caches missed (by name, warm vs timed split), GC
    * time attributable to the passes, the persisted-storage bytes at
    * entry start, and — round-9 verdict #1b — the BOX's view of the
    * same window: 1-min loadavg at entry start/end and the CPU steal
    * seconds accumulated across the entry (this box shows non-zero
    * steal — it is a VM on a shared host, so a co-tenant burst during
    * the driver window is a real, measurable slowdown source). With
    * these, a regressed entry is attributable from the artifact alone:
    * clean gc + clean misses + load/steal spike → environment.
    *
    * Round-11 verdict #2 additions — the r11 driver run had entries
    * at sustained 4-13× with CLEAN load1/steal/gc/misses, so two
    * probes the earlier fields cannot see:
    *  - `probeStartMs`/`probeMidMs`/`probeEndMs`: wall time of a
    *    FIXED single-thread busy loop run immediately before the warm
    *    pass, between warm and timed, and after the last timed pass.
    *    The instruction count is constant, so probe inflation vs the
    *    run's `probe_baseline_ms` is direct evidence of CPU
    *    starvation the loadavg missed (cgroup quota throttling,
    *    memory-bandwidth saturation, invisible co-tenant); the mid
    *    probe splits the attribution between the warm and timed
    *    windows.
    *  - `readWarmBytes`/`readTimedBytes`: /proc/self/io read_bytes
    *    deltas across the warm and timed passes — bytes this process
    *    pulled from the BLOCK LAYER (page-cache hits don't count), so
    *    a cold-cache entry re-reading parquet from disk shows a spike
    *    here while probes stay clean.
    *
    * Round-12 verdict #2 additions — the r12 driver run still had
    * entries at 5-8× with CLEAN single-thread probes (q196/q195
    * class): a one-thread probe cannot see 32-way co-scheduling or
    * memory-bandwidth starvation. The missing signal is the
    * EXECUTORS' own clock, summed per entry from a task-end listener:
    *  - `taskRunWarmSec`/`taskRunTimedSec`: Σ executorRunTime (wall
    *    each task spent running) across the warm / timed windows.
    *  - `taskCpuWarmSec`/`taskCpuTimedSec`: Σ executorCpuTime (actual
    *    CPU the tasks burned) across the same windows.
    *    The pair classifies the last attribution class from the
    *    artifact alone: timed wall inflated with task CPU inflated
    *    proportionally → real work (cache rebuild, plan change);
    *    task RUN inflated but task CPU flat → tasks sat descheduled
    *    (32-way co-scheduling / bandwidth starvation — invisible to
    *    the single-thread probe); both flat with wall inflated →
    *    driver-side or scheduler gap. */
  private final case class EntryStats(
      memStartBytes: Long,
      diskStartBytes: Long,
      gcWarmSec: Double,
      gcTimedSec: Double,
      warmMisses: Map[String, Long],
      timedMisses: Map[String, Long],
      load1Start: Double,
      load1End: Double,
      stealSec: Double,
      probeStartMs: Double,
      probeMidMs: Double,
      probeEndMs: Double,
      readWarmBytes: Long,
      readTimedBytes: Long,
      taskRunWarmSec: Double = -1.0,
      taskRunTimedSec: Double = -1.0,
      taskCpuWarmSec: Double = -1.0,
      taskCpuTimedSec: Double = -1.0,
      taskRunPasses: Seq[Double] = Seq.empty,
      taskCpuPasses: Seq[Double] = Seq.empty,
      evictedWarm: Long = 0L,
      evictedTimed: Long = 0L,
      causeClass: String = "clean",
      // round-14 verdict #1: per-entry artifact-cache activity
      // (built/hit counts + measured build seconds) split by window
      artifactsWarm: Seq[ArtifactDelta] = Seq.empty,
      artifactsTimed: Seq[ArtifactDelta] = Seq.empty,
      // round-14 ADVICE: steal scoped to the TIMED window only (the
      // all-window stealSec above stays for continuity), and evictions
      // net of explicit unpersists (pressure drops only)
      stealTimedSec: Double = -1.0,
      stealPasses: Seq[Double] = Seq.empty,
      pressureEvictedTimed: Long = 0L,
      // round-14 verdict #7: extra passes run because the min pass saw
      // hypervisor steal above the retry threshold
      retryPasses: Int = 0)

  /** Round-13 verdict #1/#2: apply the PERF.md §9 attribution table
    * MECHANICALLY per entry, so an inflated entry self-labels in the
    * artifact alone (the r13 loop still required a human to cross-read
    * five detail fields). An entry is "inflated" when its median
    * exceeds 1.5× its own min by more than 0.2 s absolute (the min is
    * the least-contended pass — the box can only make a pass slower).
    * Priority order, most-external cause first:
    *  - evicted        — persisted RDD blocks dropped UNDER MEMORY
    *                     PRESSURE during the timed window (explicit
    *                     unpersists are excluded — round-14 ADVICE: ops
    *                     that deterministically unpersist scratch
    *                     frames per pass would otherwise always
    *                     self-label "evicted")
    *  - rebuild        — a PlanCache artifact rebuilt inside the timed
    *                     window and its MEASURED build seconds cover
    *                     ≥25% of the inflation (round-14 verdict #1:
    *                     the direct per-entry attribution the run-wide
    *                     hit flags could not give)
    *  - steal          — hypervisor steal DURING THE TIMED WINDOW
    *                     covers ≥25% of the inflation (round-14 ADVICE:
    *                     warm-pass steal no longer counts)
    *  - starved        — the fixed-work 1-thread probe ran ≥2× its
    *                     run baseline (cgroup/co-tenant CPU shortage)
    *  - real-work      — worst pass burned ≥1.5× the best pass's task
    *                     CPU: the work itself grew (plan change, cache
    *                     rebuild below the named-counter granularity)
    *  - descheduled    — task RUN grew ≥1.5× with CPU flat: tasks sat
    *                     runnable (32-way co-scheduling / bandwidth)
    *  - driver-gap     — wall inflated, executors idle: scheduler or
    *                     driver-side gap
    * Entries below the threshold are "clean"; entries with no timed
    * passes are "none". */
  private[graft] def causeClass(timed: Seq[Double], taskRun: Seq[Double],
      taskCpu: Seq[Double], stealSec: Double, probeMidMs: Double,
      probeEndMs: Double, probeBaseMs: Double, evictedTimed: Long,
      rebuildSecTimed: Double = 0.0): String = {
    if (timed.isEmpty) return "none"
    val mn = timed.min
    val sorted = timed.sorted
    val med = if (sorted.size % 2 == 1) sorted(sorted.size / 2)
              else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
    if (med < mn * 1.5 || med - mn < 0.2) return "clean"
    val inflation = timed.sum - timed.size * mn
    if (evictedTimed > 0) return "evicted"
    if (rebuildSecTimed > 0.1 && rebuildSecTimed >= 0.25 * inflation)
      return "rebuild"
    if (stealSec > 0 && stealSec >= 0.25 * inflation) return "steal"
    if (probeBaseMs > 0 &&
      math.max(probeMidMs, probeEndMs) >= 2.0 * probeBaseMs) return "starved"
    // per-pass executor clocks: worst wall pass vs best wall pass
    if (taskRun.size == timed.size && taskCpu.size == timed.size) {
      val best = timed.indices.minBy(timed(_))
      val worst = timed.indices.maxBy(timed(_))
      val cpuRatio = taskCpu(worst) / math.max(taskCpu(best), 0.01)
      val runRatio = taskRun(worst) / math.max(taskRun(best), 0.01)
      if (cpuRatio >= 1.5) return "real-work"
      if (runRatio >= 1.5 && cpuRatio < 1.25) return "descheduled"
    }
    "driver-gap"
  }

  /** Cumulative executor task clocks (run wall ms, CPU ns), fed by a
    * task-end listener registered once per bench JVM. Both counters
    * are cumulative and monotone, so per-entry deltas stay exact even
    * though the listener bus delivers asynchronously — a straggling
    * task-end lands in the NEXT snapshot's delta instead of being
    * lost (attribution at ≥3× inflation does not need ms precision). */
  private[graft] object TaskClock
      extends org.apache.spark.scheduler.SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
      }
    }
    def snapshot(): (Long, Long) = (runMs.get(), cpuNs.get())
    /** Idempotent registration (round-13 ADVICE: a second bare
      * addSparkListener in the same JVM — e.g. a spec re-running the
      * bench path — would double-count every task's run/CPU time).
      * Remove-then-add guarantees exactly one delivery per context;
      * a stale registration on a stopped context is inert. */
    def register(sc: org.apache.spark.SparkContext): Unit = {
      sc.removeSparkListener(this)
      sc.addSparkListener(this)
    }
  }

  /** Cumulative count of persisted RDD blocks DROPPED from storage
    * (round-13 verdict #7: `persisted_mem_bytes` alone cannot
    * distinguish "artifact evicted and rebuilt" from "CPU starved" —
    * q55's driver-run CPU tripled while cool runs held). A block
    * update whose new storage level is invalid IS the eviction/removal
    * event on the listener bus (both memory-pressure drops and
    * explicit unpersists land here; the separate unpersist counter
    * splits the two — evictions = dropped − unpersisted). Same
    * monotone-cumulative discipline as [[TaskClock]]. */
  private[graft] object EvictionClock
      extends org.apache.spark.scheduler.SparkListener {
    val droppedBlocks = new java.util.concurrent.atomic.AtomicLong(0L)
    val unpersistedRdds = new java.util.concurrent.atomic.AtomicLong(0L)
    /** Drops NOT attributable to an explicit unpersist — the round-14
      * ADVICE split: `onUnpersistRDD` records the RDD id (ids are
      * monotone per context, never reused), and a block drop whose RDD
      * was explicitly unpersisted counts as housekeeping, not memory
      * pressure. Only PRESSURE drops feed the "evicted" cause class —
      * ops that deterministically unpersist scratch frames per timed
      * pass (q227's tightSym, PlanCache turnover) no longer self-label
      * their inflation "evicted". The unpersist event posts on the bus
      * before the async block removals it triggers, so the id is in
      * the set by the time its drops arrive. */
    val pressureDroppedBlocks = new java.util.concurrent.atomic.AtomicLong(0L)
    private val unpersistedIds =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    override def onBlockUpdated(
        bu: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
      val info = bu.blockUpdatedInfo
      if (info.blockId.isRDD && !info.storageLevel.isValid) {
        droppedBlocks.incrementAndGet()
        val rddId = info.blockId.asRDDId.map(_.rddId).getOrElse(-1)
        if (!unpersistedIds.contains(rddId))
          pressureDroppedBlocks.incrementAndGet()
      }
    }
    override def onUnpersistRDD(
        u: org.apache.spark.scheduler.SparkListenerUnpersistRDD): Unit = {
      unpersistedRdds.incrementAndGet()
      unpersistedIds.add(u.rddId)
    }
    def snapshot(): (Long, Long) = (droppedBlocks.get(), unpersistedRdds.get())
    def pressureSnapshot(): Long = pressureDroppedBlocks.get()
    def register(sc: org.apache.spark.SparkContext): Unit = {
      sc.removeSparkListener(this)
      sc.addSparkListener(this)
    }
  }

  /** Iteration count for the calibration probe: xorshift64 steps —
    * ~10 ms single-thread on this box's CPU when unthrottled, cheap
    * enough to run twice per entry (~5 s across a 244-entry run). */
  private val ProbeIters = 8000000L
  // the probe result escapes through a volatile so the JIT cannot
  // elide the loop
  @volatile private var probeSink = 0L

  /** Wall milliseconds for [[ProbeIters]] xorshift64 steps on one
    * thread — the fixed-work CPU availability probe. */
  private[graft] def probeMs(): Double = {
    val t0 = System.nanoTime()
    var x = 88172645463325252L
    var i = 0L
    while (i < ProbeIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    probeSink = x
    (System.nanoTime() - t0) / 1e6
  }

  /** Cumulative bytes this process has read from the block layer
    * (/proc/self/io read_bytes — page-cache hits excluded); −1 where
    * unreadable (non-Linux, restricted /proc). */
  private def readBytes(): Long =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/io"))
      .linesIterator.find(_.startsWith("read_bytes:"))
      .map(_.substring("read_bytes:".length).trim.toLong).getOrElse(-1L)
    catch { case _: Exception => -1L }

  private def ioDelta(start: Long, end: Long): Long =
    if (start < 0 || end < 0) -1L else end - start

  /** Run-level probe baseline (median of 7 idle probes at startup);
    * set once by main before the phases, read by flush. */
  @volatile private var probeBaselineMs: Double = -1.0

  /** 1-minute load average from /proc/loadavg (−1 where unreadable,
    * e.g. non-Linux). */
  private def load1(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Cumulative CPU-steal jiffies from /proc/stat (field 8 of the
    * aggregate cpu line); −1 where unreadable. Deltas across an entry
    * convert to seconds at the USER_HZ=100 Linux default. */
  private def stealJiffies(): Long =
    try {
      // Files.readString, not Source.fromFile: this runs twice per
      // bench entry and an unclosed Source leaks a file handle each
      // call (~480 fds across a 241-entry run, in a harness where fd
      // exhaustion has been observed — round-10 ADVICE).
      val cpu = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.find(_.startsWith("cpu ")).getOrElse("")
      val f = cpu.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else -1L
    } catch { case _: Exception => -1L }

  private def missDelta(before: Map[String, Long],
      after: Map[String, Long]): Map[String, Long] =
    after.collect { case (k, v) if v - before.getOrElse(k, 0L) > 0 =>
      k -> (v - before.getOrElse(k, 0L))
    }

  /** Storage-layer observability for the bench tail (round-6 verdict
    * #1: the suite now persists many artifacts across the whole run —
    * pair graphs, signatures, codebooks, exact top-k — and regressions
    * in UNRELATED map-only entries pointed at cache memory pressure;
    * measure it, don't guess). Persisted bytes via the RDD storage
    * listing; GC time via the JVM's collector beans. */
  @annotation.nowarn("cat=deprecation")
  private def storageBytes(s: SparkSession): (Long, Long) = {
    val infos = s.sparkContext.getRDDStorageInfo
    (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).filter(_ > 0).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).filter(_ >= 1).getOrElse(3)
    val spark = GraftSession.builder("graft-bench", cores = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // round-12 verdict #2: the executors' own clock per entry — the
    // attribution signal a single-thread probe cannot provide.
    // register() is remove-then-add, so a re-entrant bench (or a spec
    // that already registered the singleton) can never double-count.
    TaskClock.register(spark.sparkContext)
    EvictionClock.register(spark.sparkContext)

    // ---- phase 1: serde, the reference's README workload shape
    val conf = EngineConf(totalMensagens = 100000, tamanhoMensagemKB = 1,
      warmupMensagens = 0, seed = 42)
    val tmp = graft.operators.PlanCache.tempDir("graft_bench_")
    val results = scala.collection.mutable.LinkedHashMap[String, Timing]()
    val stats = scala.collection.mutable.LinkedHashMap[String, EntryStats]()

    // JVM/codegen warm-up (not reported)
    run(Generator.messages(spark, conf.copy(totalMensagens = 5000)))

    // calibration-probe baseline: median of 7 after 3 JIT warm-ups,
    // taken while the session is otherwise idle — every per-entry
    // probe_start_ms/probe_end_ms reads against this number
    (1 to 3).foreach(_ => probeMs())
    probeBaselineMs = {
      val ps = (1 to 7).map(_ => probeMs()).sorted
      ps(ps.size / 2)
    }

    // ---- phase 1b prep: the compression axis (reference
    // ConfiguracaoKafka.java:112-118 — producer compression.type is a
    // first-class benchmark variable there; here it maps onto the
    // file codec exactly as Main.produce does). The default (lz4)
    // rides in the main serde entries; the sweep adds the other
    // codecs the reference exposes, each in its own dir so a consume
    // entry reads files written with that codec.
    val codecSweep = Seq("none", "snappy", "gzip", "zstd")

    // the exact CLI pipelines (produce = generate+serialize+write,
    // consume = read+[parse]+metrics). The warm pass covers JIT,
    // codegen cache and page cache for each mode's files — round 1
    // timed each mode once, cold, in a fixed order, and the ordering
    // artifacts were visible (json TRANSPORTE measured slower than
    // json E2E_PARSE, impossible in steady state).
    val e2e = conf.copy(benchMode = "E2E_PARSE")
    val transp = conf.copy(benchMode = "TRANSPORTE")
    val serdeRuns: Seq[(String, () => Unit)] = Seq(
      "produce_avro" -> (() => Main.produce(spark, conf, tmp, avro = true).collect()),
      "produce_json" -> (() => Main.produce(spark, conf, tmp, avro = false).collect()),
      "consume_avro_e2e" -> (() => Main.consume(spark, e2e, tmp, avro = true).collect()),
      "consume_json_e2e" -> (() => Main.consume(spark, e2e, tmp, avro = false).collect()),
      "consume_avro_transporte" -> (() => Main.consume(spark, transp, tmp, avro = true).collect()),
      "consume_json_transporte" -> (() => Main.consume(spark, transp, tmp, avro = false).collect()))
    // serde phase hardening (round-3 verdict #3: these are the
    // headline reference-parity numbers and showed 3× pass spreads
    // under box contention): ≥5 timed passes each — they are
    // seconds-cheap — and the passes are INTERLEAVED round-robin
    // across the six entries, so one contention burst degrades one
    // pass of every entry instead of every pass of one entry.
    // Round-14 verdict #2: these legs now carry the same per-pass
    // task-clock/steal telemetry and `cause_class` as the query
    // entries (they were 6 of the 14 unclassified entries) — each
    // individual (entry, pass) timing is bracketed by TaskClock and
    // steal snapshots; probes run once per round-robin CYCLE (a
    // per-timing probe would add ~10 ms to every sub-second pass).
    val serdePasses = math.max(passes, 5)
    val serdeLoadStart = load1()
    val serdeWarm = serdeRuns.map { case (name, go) => name -> time(go()) }.toMap
    val serdeProbeMid = probeMs()
    val serdeTimed = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      serdeRuns.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    val serdeRun = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      serdeRuns.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    val serdeCpu = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      serdeRuns.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    val serdeSteal = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      serdeRuns.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    var serdeProbeMax = serdeProbeMid
    (1 to serdePasses).foreach { _ =>
      serdeRuns.foreach { case (name, go) =>
        val (rp0, cp0) = TaskClock.snapshot()
        val sj0 = stealJiffies()
        val w = time(go())
        val (rp1, cp1) = TaskClock.snapshot()
        val sj1 = stealJiffies()
        serdeTimed(name) = serdeTimed(name) :+ w
        serdeRun(name) = serdeRun(name) :+ (rp1 - rp0) / 1e3
        serdeCpu(name) = serdeCpu(name) :+ (cp1 - cp0) / 1e9
        serdeSteal(name) = serdeSteal(name) :+
          (if (sj0 < 0 || sj1 < 0) -1.0 else (sj1 - sj0) / 100.0)
      }
      serdeProbeMax = math.max(serdeProbeMax, probeMs())
      // crash-artifact guarantee inside the (now longer) serde phase:
      // a run killed mid-phase still leaves a parseable partial with
      // every completed round-robin pass, matching phase 2's
      // flush-after-every-entry discipline (round-4 ADVICE)
      serdeRuns.foreach { case (name, _) =>
        results(name) = Timing(serdeWarm(name), serdeTimed(name))
      }
      flush(spark, results, stats, passes, serdePasses, 0L, 0L, 0L, conf, sfDir,
        cpus, partial = true)
    }
    val serdeLoadEnd = load1()
    serdeRuns.foreach { case (name, _) =>
      val timed = serdeTimed(name)
      val stealVals = serdeSteal(name).filter(_ >= 0)
      val stealSum = if (stealVals.isEmpty) -1.0 else stealVals.sum
      stats(name) = EntryStats(0L, 0L, -1.0, -1.0, Map.empty, Map.empty,
        serdeLoadStart, serdeLoadEnd, stealSum,
        -1.0, serdeProbeMid, serdeProbeMax, -1L, -1L,
        -1.0, serdeRun(name).sum, -1.0, serdeCpu(name).sum,
        serdeRun(name), serdeCpu(name), 0L, 0L,
        causeClass(timed, serdeRun(name), serdeCpu(name), stealSum,
          serdeProbeMid, serdeProbeMax, probeBaselineMs, 0L),
        stealTimedSec = stealSum, stealPasses = serdeSteal(name))
    }

    // ---- phase 1b: compression sweep (avro produce + E2E consume per
    // codec; 3 timed passes each — the entries are sub-second and the
    // axis wants the ORDERING across codecs, not tail precision)
    codecSweep.foreach { codec =>
      val cconf = conf.copy(compressionType = codec)
      val cdir = graft.operators.PlanCache.tempDir(s"graft_bench_${codec}_")
      try {
        // full instrumentation (round-14 verdict #2: the 8 codec legs
        // were unclassified) — same helper as the query entries
        val (pT, pS) = timeEntry(spark, 3)(
          () => Main.produce(spark, cconf, cdir, avro = true).collect())
        results(s"produce_avro_$codec") = pT
        stats(s"produce_avro_$codec") = pS
        val (cT, cS) = timeEntry(spark, 3)(
          () => Main.consume(spark, cconf.copy(benchMode = "E2E_PARSE"),
            cdir, avro = true).collect())
        results(s"consume_avro_e2e_$codec") = cT
        stats(s"consume_avro_e2e_$codec") = cS
      } catch {
        // a codec missing from the runtime (e.g. no native lib) skips
        // its entries rather than killing the run
        case e: Throwable =>
          System.err.println(s"[bench] codec $codec failed: ${e.getMessage}")
      }
      flush(spark, results, stats, passes, serdePasses, 0L, 0L, 0L, conf, sfDir,
        cpus, partial = true)
    }

    // ---- phase 2: headline queries at the SF dir
    val headline = Seq(
      "q10_pricing_summary", "q11_revenue_nation", "q12_top_customers",
      "q13_window_orders", "q17_distinct", "q20_latest_by_key", "q21_tumbling",
      "q30_textstats", "q35_jaccard_pairs", "q37_neardup_lsh", "q38_simhash",
      "q39_neardup_capped", "q40_cosine_topk", "q41_ann_lsh", "q43_cos_neardup",
      "q45_media_meta", "q50_bucketed_join", "q53_simhash_neardup",
      // round-2 operators, added so r3+ regressions are visible
      "q55_vocab_topk", "q56_seq_pack", "q57_stratified_sample",
      "q59_decontaminate", "q60_partition_pruning", "sq1_stream_tumbling",
      // round-3 operators
      "q48_rolling_hash", "q62_repetition", "q63_chunk_overlap",
      "sq4_stream_sliding", "q64_lm_score", "q65_trunc_fidelity",
      "q66_scene_cuts", "q67_dedup_clusters", "sq5_stream_enrich",
      "q68_mix_weights", "q69_modality_agreement", "q70_bpe_merges",
      "q71_bpe_tokenize",
      // round-4: the cheap previously-uncovered entries (verdict #5 —
      // regressions in them were invisible) + the new capped LM
      "q42_label_centroids", "q46_frame_sample", "q52_sketches",
      "q54_frame_features", "q58_embed_quantize", "q61_ivf_recall",
      "sq2_stream_dedup", "sq3_stream_join", "q72_lm_score_capped",
      // round-5 operators
      "q73_bpe_exhausted", "q74_kmeans_codebook", "q75_pagerank",
      "q76_zorder_pruned", "q77_dup_ngrams", "q78_semdedup",
      "q79_dedup_survivors", "q80_cms_topk", "q81_bm25",
      // round-5 second batch: funnel, quota, PQ/ADC, streaming sessions
      "q82_funnel", "q83_source_quota", "q84_pq_adc_recall",
      "sq6_sessionize", "q85_audio_energy", "q86_thumbnail",
      // round-6: the 26 previously-untimed entries (round-5 verdict #2
      // — regressions in them were invisible; all individually cheap)
      // + the new EventTimeTimeout sessionizer
      "q01_metrics", "q02_por_particao", "q03_warmup", "q04_transporte",
      "q05_tail_scan", "q06_rollup_formato", "q10_pricing_sql",
      "q14_rollup_orders", "q15_setops", "q16_semi_anti", "q18_asof_join",
      "q19_cube_orders", "q22_sessionize", "q24_range_join",
      "q25_grouping_sets", "q26_pivot_events", "q27_percentiles",
      "q31_langid", "q32_quality", "q33_fingerprint", "q34_exact_dedup",
      "q36_minhash_sig", "q44_ivf_topk", "q47_ann_recall",
      "q49_confluent_wire", "q51_salted_join", "sq7_sessionize_timeout",
      "q87_bloom_decontaminate",
      // round-7 operators
      "q88_containment", "q89_ivfpq_recall", "sq8_stream_sketch",
      "q90_source_overlap", "q91_vocab_coverage", "q92_incremental_dedup",
      "q93_pmi_collocations", "sq9_stream_incr_dedup", "q94_quality_sample",
      "q95_pii_redact", "q96_editdist_verify",
      // round-8 operators
      "q97_retention_cohorts", "q98_transitions", "q99_blocklist_filter",
      "q100_zipf_slope", "q101_phrase_search",
      // round-9 operators
      "q102_label_separation", "q103_winnowing", "q104_dedup_report",
      "q105_image_phash", "q106_reconcile", "sq10_stream_dedup_ttl",
      // round-10 operators
      "q107_span_dedup", "q108_gopher_rules", "q109_jl_projection",
      "q110_token_entropy", "sq11_stream_left_join",
      "q111_temperature_mix", "q112_user_anomaly", "sq12_stream_rollup",
      // round-8 second wave
      "q113_bloom_join", "q114_gapfill_locf", "q115_rolling_peak",
      "q116_triangles", "q117_skyline", "q118_fuzzy_join",
      "q119_hll_incremental", "sq13_stream_profile",
      "q120_scd2", "q121_table_checksum", "q122_ab_test",
      "q123_interval_peak", "sq14_foreach_sink", "q124_json_extract",
      "q125_confusion_matrix", "q126_roc_auc",
      "q127_ks_drift", "q128_mutual_info",
      "q129_user_trend", "q130_changepoint",
      "q131_rollup_cascade", "q132_pit_join",
      "q133_hierarchy", "q134_lateral_topk",
      "q135_profile", "q136_benford", "q137_avro_evolution",
      "sq15_stream_timer_session", "sq16_stream_lastn",
      "sq17_stream_type_counts", "q138_prefix_jaccard",
      // round-9 (continuous-build round 9) operators
      "q139_histogram", "q140_winsorize", "q141_itemsets",
      "q142_unpivot", "q143_notin_nulls", "q144_asof_tolerance",
      "q145_ivm_view", "q146_bfs_paths",
      "sq18_stream_join_chain", "q147_cluster_split",
      "q148_pps_sample", "q149_skew_report", "q150_equidepth_hist",
      "q151_cdc_apply", "q152_embed_audit", "q153_graph_profile",
      "q154_multitouch", "q155_bottomk_quantile",
      "q156_observed_metrics", "q157_dynamic_overwrite",
      "q158_label_prop", "sq19_late_data",
      "q159_pipe_syntax", "q160_variant_shred", "q161_collation",
      "q162_param_sql", "q163_window_zoo", "q164_setops_all",
      "q165_paginate", "q166_group_by_all", "sq20_update_mode",
      "q167_chunk_manifest", "q168_format_roundtrip", "q169_merge_schema",
      "q170_join_hints", "q171_hof_zoo", "q172_calendar_zoo",
      "q173_corpus_diff", "q174_token_budget_select", "q175_psi_drift",
      "q176_bottomk_sample", "q177_crawl_novelty", "sq21_stream_psi_monitor",
      "q178_lr_quality", "q179_auc_midrank", "q180_calibration",
      "q181_epoch_alloc", "q182_train_shuffle", "q183_preference_pairs",
      "q184_hard_negatives", "q185_k_anonymity", "q186_span_corruption",
      "q187_soft_dedup_weights", "q188_dsir_weights",
      "q189_rank_agreement", "q190_retention_sweep",
      "q191_rrf_fusion", "q192_margin_align", "q193_neighbor_jaccard",
      "q194_mmr_diversify", "q195_silhouette", "q196_code_switch",
      "q197_semantic_decon", "q198_ann_rank_eval", "q199_embed_drift",
      "q200_cdc_chunks", "q201_assortativity",
      "q202_source_sketch_jaccard", "q203_shuffle_quality",
      "q204_context_pack", "q205_embed_coverage",
      "q206_source_concentration", "q207_labeler_kappa",
      "q208_marginal_novelty", "q209_cohort_retention",
      "q210_funnel_steps", "q211_event_gaps",
      // round-12 operators
      "q212_hamming_topk", "q213_lsh_calibration",
      "q214_weighted_jaccard", "sq22_stream_neardup_gate",
      "q215_probe_sweep", "q216_dedup_sweep", "q217_pack_sweep",
      // round-13 operators
      "q218_mih_topk", "q219_source_datacard", "q220_lsh_geometry_sweep",
      "sq23_stream_anomaly", "q221_semdedup_sweep", "q222_sql_udf",
      "q223_approx_quantile_cert", "q224_join_cardinality",
      "q225_attribution_sweep", "q226_cluster_quality",
      // round-14 operators
      "q227_split_survivors", "q228_template_coverage", "q229_split_leakage",
      "q230_embedding_outliers", "q231_tokenizer_fertility",
      "q232_phash_neardup", "sq24_stream_distinct", "q233_rfm_segments",
      "q234_ivf_balance", "sq25_session_window", "q235_exec_immediate",
      "q236_sql_script", "q237_sql_table_fn", "q238_rrf_sweep",
      // round-15 operators
      "q239_ivf_add_batch", "q240_bm25_staleness", "q241_knn_hubness",
      "q242_codebook_sweep", "q243_exact_topk_blocked",
      "q244_state_inspect",
      // round-15 second batch
      "q245_kcore", "q246_l_diversity", "q247_seasonal_residuals",
      "q248_compaction_bins", "q249_audio_segments",
      "sq26_stream_full_outer", "q250_tfidf_terms", "q251_salt_planner",
      "q252_noised_release", "q253_listagg", "q254_approx_topk_cert")
    // shingle-index misses during TIMED passes only (warm passes are
    // expected to build it once per session+dir)
    var timedIndexMisses = 0L
    var timedLabelMisses = 0L
    var timedArtifactMisses = 0L
    // optional inter-entry settle (round-7 verdict #4: driver-run
    // entries showed timed > warm variance consistent with GC or box
    // co-scheduling; a short pause decorrelates an entry's timed
    // passes from its predecessor's allocation burst). Default off —
    // the per-entry gc/miss telemetry is the primary diagnostic.
    val settleMs = sys.env.get("SPARK_GRAFT_BENCH_SETTLE_MS")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).filter(_ > 0)
    // optional comma-separated entry filter (the Verify
    // SPARK_GRAFT_ONLY counterpart) for local iteration on a few
    // changed entries; unset — the driver's path — times everything
    val benchOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    headline.filter(n => benchOnly.forall(_.contains(n))).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[bench] unknown headline query: $name")
        case Some(fn) =>
          settleMs.foreach(Thread.sleep)
          // per-query isolation: one failure must not lose the run
          try {
            val (t, st) = timeEntry(spark, passes)(
              () => run(fn(spark, sfDir)))
            timedIndexMisses += st.timedMisses.getOrElse("shingle", 0L)
            timedLabelMisses += st.timedMisses.getOrElse("label", 0L)
            timedArtifactMisses +=
              (st.timedMisses - "shingle" - "label").values.sum
            results(name) = t
            stats(name) = st
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              results(name) = Timing(-1.0, Seq.empty)
          }
          // flush after EVERY entry: a killed/timed-out run still
          // leaves a parseable partial artifact at the well-known path
          flush(spark, results, stats, passes, serdePasses, timedIndexMisses,
            timedLabelMisses, timedArtifactMisses, conf, sfDir, cpus, partial = true)
      }
    }
    // ---- recheck phase (round-9 verdict #1: six entries regressed
    // ≥2× on unchanged code with clean gc/miss telemetry; hypothesis
    // (a) was cumulative session state across the 200-entry run).
    // Re-time the regression sentinels at the END of the run, in the
    // same JVM, with everything accumulated: if the recheck min ≈ the
    // mid-run min, cumulative state is exonerated and a mid-run spike
    // was the box; if recheck ≫ mid-run, state accumulation is real
    // and the artifact says so directly. zstd consume rides along for
    // the same reason (its r9 curve was monotone within one entry).
    // round-10 verdict #6: two round-10 heavies join the sentinel set
    // so the cumulative-state exoneration covers the new surface;
    // round 12: sq18 joins — it is the suite's most expensive entry
    // AND the most steal-sensitive (the r12 closeout measured 143 s
    // of hypervisor steal across its window), so its end-of-run
    // retime separates a mid-run steal burst from real cost
    val sentinels = Seq("q45_media_meta", "q47_ann_recall", "q51_salted_join",
      "q88_containment", "q89_ivfpq_recall", "sq7_sessionize_timeout",
      "q193_neighbor_jaccard", "q202_source_sketch_jaccard",
      "sq18_stream_join_chain")
    val recheck = scala.collection.mutable.LinkedHashMap[String, Timing]()
    sentinels.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try recheck(name) = measure(passes)(() => run(fn(spark, sfDir)))
        catch { case e: Throwable =>
          System.err.println(s"[bench] recheck $name failed: ${e.getMessage}")
        }
      }
    }
    val (compactLine, _) =
      flush(spark, results, stats, passes, serdePasses, timedIndexMisses,
        timedLabelMisses, timedArtifactMisses, conf, sfDir, cpus,
        partial = false, recheck = recheck)
    // stdout carries the COMPACT line only: the full line (detail,
    // mins) grew past what the driver's log scrape windows (BENCH_r04
    // captured only the tail of a ~6 KB line → parsed: null); the
    // complete JSON always lands in bench_out.json — written
    // atomically (round-7 verdict #2), path announced on stderr
    println(compactLine)
    // round-9 verdict #3: the driver's tail-capture parsed null twice
    // (r7, r9). A second, PREFIXED copy of the canonical compact line
    // gives any log scraper an unambiguous anchor to grep for, even
    // when sbt decorates the lines around it.
    println(s"BENCH_JSON: $compactLine")
    // round-10 verdict #2: the compact line above is still ~7 KB (241
    // query medians) and the driver's tail capture truncates its FRONT
    // — BENCH_r{8,9,10}.json all parsed null. Emit a ≤1 KB summary
    // (entry count, total, slowest-10) as the LAST stdout lines, once
    // prefixed for grep anchoring and once bare, so any tail window
    // ends with one complete parseable record.
    val summary = summaryLine(results, conf.totalMensagens, sfDir, cpus)
    println(s"BENCH_SUMMARY: $summary")
    println(summary)
    System.err.println(s"[bench] full artifact: ${benchOutPath.toAbsolutePath}")
    spark.stop()
  }

  /** Build the bench JSON from the results so far and write it to the
    * well-known output path (sbt decorates stdout with [info]/[error]
    * prefixes, so consumers read the file — SPARK_GRAFT_BENCH_OUT if
    * set, else ./bench_out.json; see README "Benchmark output").
    * `partial` marks in-progress snapshots. Returns (compact headline
    * line for stdout, full line written to the file). */
  /** The ≤1 KB tail summary: entry count, total, the ten slowest
    * entries by MIN. Its SIZE is the contract — the driver's tail capture
    * truncates long lines from the FRONT, so the last stdout record
    * must fit any scrape window whole (spec-pinned: bounded length,
    * parseable, top-10 sorted descending). */
  private[graft] def summaryLine(results: collection.Map[String, Timing],
      serdeMsgs: Long, sfDir: String, cpus: Int,
      artifactPath: String = benchOutPath.toAbsolutePath.toString): String = {
    // round-13 verdict #1: the summary (and headline) carry the
    // per-entry MIN — the least-contended observation, steal-robust —
    // not the median a contended box turns into false regressions
    // (BENCH_r13 recorded q92 at 4.95 s vs a true 0.53 s min under
    // 8.2 s of hypervisor steal). Medians stay in the full detail.
    val mins = results.map { case (k, t) => k -> t.min }
      .filter(_._2 >= 0)
    val top10 = mins.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s""""$k":${jnum(v, 3)}""" }
      .mkString("{", ",", "}")
    val msgsAvro = results.get("consume_avro_e2e").map(_.min)
      .filter(_ > 0).map(serdeMsgs / _).getOrElse(0.0)
    val core =
      s"""{"metric":"total","value":${jnum(mins.values.sum, 3)},"unit":"sec",""" +
        s""""n":${mins.size},"queries":$top10,"sf":"$sfDir","cpus":$cpus,""" +
        s""""avro_e2e_msgs_per_sec":${jnum(msgsAvro, 1)}"""
    // the 1 KB size IS the contract (front-truncating tail capture);
    // the artifact path is a convenience also printed on stderr — drop
    // it rather than let a long SPARK_GRAFT_BENCH_OUT path push the
    // guaranteed-to-fit last line past the budget (round-11 ADVICE)
    val withPath = core + s""","full_artifact":"$artifactPath"}"""
    if (withPath.length <= 1024) withPath else core + "}"
  }

  /** Canonical full-artifact path (SPARK_GRAFT_BENCH_OUT if set, else
    * ./bench_out.json). */
  private def benchOutPath: java.nio.file.Path =
    java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))

  private def flush(spark: SparkSession, results: collection.Map[String, Timing],
      stats: collection.Map[String, EntryStats],
      passes: Int, serdePasses: Int, timedIndexMisses: Long, timedLabelMisses: Long,
      timedArtifactMisses: Long, conf: EngineConf, sfDir: String,
      cpus: Int, partial: Boolean,
      recheck: collection.Map[String, Timing] = Map.empty): (String, String) = {
    def num(v: Double, places: Int): String = jnum(v, places)
    def missJson(m: Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    // round-14 verdict #1: per-entry artifact rows — a rebuilt shared
    // artifact lands (with its measured build seconds) on the entry
    // whose window paid for it; empty windows are omitted so the
    // steady state reads clean
    def artJson(field: String, ds: Seq[ArtifactDelta]): String =
      if (ds.isEmpty) ""
      else s""","$field":""" + ds.map(d =>
        s"""{"artifact":"${d.name}","built":${d.built},"hit":${d.hit},""" +
          s""""build_sec":${num(d.buildSec, 3)}""" +
          (if (d.published == 0) "" else s""","published":${d.published}""") +
          "}").mkString("[", ",", "]")
    // round-13 verdict #1: headline `queries`/`value` are MIN-based
    // (steal-robust); the median moves to `queries_median` + per-entry
    // detail so a round-over-round diff reads steady-state cost, not
    // the box's contention during the driver window
    val mins = results.map { case (k, t) => k -> t.min }
    val medians = results.map { case (k, t) => k -> t.median }
    val total = mins.values.filter(_ >= 0).sum
    val totalMedian = medians.values.filter(_ >= 0).sum
    val msgsPerSecAvro = mins.get("consume_avro_e2e")
      .filter(_ > 0).map(conf.totalMensagens / _).getOrElse(0.0)
    val qs = mins.map { case (k, v) => s""""$k":${num(v, 3)}""" }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, t) =>
      val timed = t.timed.map(num(_, 3)).mkString("[", ",", "]")
      // per-entry telemetry (round-7 verdict #1/#4): GC seconds spent
      // during the warm and timed passes, persisted storage at entry
      // start, and named artifact-cache misses — empty miss maps are
      // omitted so the steady state reads clean
      val extra = stats.get(k).map { st =>
        val wm = if (st.warmMisses.isEmpty) ""
                 else s""","warm_misses":${missJson(st.warmMisses)}"""
        val tm = if (st.timedMisses.isEmpty) ""
                 else s""","timed_misses":${missJson(st.timedMisses)}"""
        s""","gc_warm_sec":${num(st.gcWarmSec, 3)}""" +
          s""","gc_timed_sec":${num(st.gcTimedSec, 3)}""" +
          s""","mem_start":${st.memStartBytes},"disk_start":${st.diskStartBytes}""" +
          s""","load1_start":${num(st.load1Start, 2)}""" +
          s""","load1_end":${num(st.load1End, 2)}""" +
          s""","steal_sec":${num(st.stealSec, 2)}""" +
          s""","probe_start_ms":${num(st.probeStartMs, 2)}""" +
          s""","probe_mid_ms":${num(st.probeMidMs, 2)}""" +
          s""","probe_end_ms":${num(st.probeEndMs, 2)}""" +
          s""","read_warm_bytes":${st.readWarmBytes}""" +
          s""","read_timed_bytes":${st.readTimedBytes}""" +
          s""","task_run_warm_sec":${num(st.taskRunWarmSec, 3)}""" +
          s""","task_run_timed_sec":${num(st.taskRunTimedSec, 3)}""" +
          s""","task_cpu_warm_sec":${num(st.taskCpuWarmSec, 3)}""" +
          s""","task_cpu_timed_sec":${num(st.taskCpuTimedSec, 3)}""" +
          (if (st.taskRunPasses.isEmpty) "" else
            s""","task_run_passes":${st.taskRunPasses.map(num(_, 3))
              .mkString("[", ",", "]")}""" +
            s""","task_cpu_passes":${st.taskCpuPasses.map(num(_, 3))
              .mkString("[", ",", "]")}""") +
          s""","evicted_warm":${st.evictedWarm}""" +
          s""","evicted_timed":${st.evictedTimed}""" +
          s""","pressure_evicted_timed":${st.pressureEvictedTimed}""" +
          s""","steal_timed_sec":${num(st.stealTimedSec, 2)}""" +
          (if (st.stealPasses.isEmpty) "" else
            s""","steal_passes":${st.stealPasses.map(num(_, 2))
              .mkString("[", ",", "]")}""") +
          (if (st.retryPasses == 0) "" else
            s""","retry_passes":${st.retryPasses}""") +
          s""","cause_class":"${st.causeClass}"""" +
          artJson("artifacts_warm", st.artifactsWarm) +
          artJson("artifacts_timed", st.artifactsTimed) +
          wm + tm
      }.getOrElse("")
      s""""$k":{"warm":${num(t.warm, 3)},"min":${num(t.min, 3)},""" +
        s""""median":${num(t.median, 3)},"timed":$timed$extra}"""
    }.mkString("{", ",", "}")
    // the contended-window view: medians per entry (the r13-and-prior
    // headline), kept for round-over-round continuity
    val qmedians = medians.map { case (k, v) => s""""$k":${num(v, 3)}""" }
      .mkString("{", ",", "}")
    val (persistedMem, persistedDisk) = storageBytes(spark)
    // end-of-run sentinel retimes (empty until the recheck phase runs;
    // small, so it rides in BOTH the compact and full lines): per
    // sentinel `[min, mid_run_min]` — ratio ≈ 1 exonerates cumulative
    // session state, ratio ≫ 1 indicts it
    val recheckJson =
      if (recheck.isEmpty) ""
      else recheck.map { case (k, t) =>
        val mid = results.get(k).map(_.min).getOrElse(-1.0)
        s""""$k":[${num(t.min, 3)},${num(mid, 3)}]"""
      }.mkString(""""recheck":{""", ",", "},")
    val tailFields = recheckJson +
      // timed_passes describes phase-2 query entries; the serde
      // entries run math.max(passes,5) interleaved passes and carry
      // their own count (round-4 ADVICE: one global count
      // misdescribed the serde detail arrays)
      s""""timed_passes":$passes,"serde_timed_passes":$serdePasses,""" +
        s""""shingle_index_hit":${timedIndexMisses == 0},""" +
        s""""label_cache_hit":${timedLabelMisses == 0},""" +
        s""""artifact_cache_hit":${timedArtifactMisses == 0},"partial":$partial,""" +
        s""""persisted_mem_bytes":$persistedMem,""" +
        s""""persisted_disk_bytes":$persistedDisk,""" +
        s""""probe_baseline_ms":${num(probeBaselineMs, 2)},""" +
        s""""gc_time_sec":${num(gcMillis() / 1000.0, 1)},""" +
        s""""total_median":${num(totalMedian, 3)},""" +
        s""""evicted_blocks_total":${EvictionClock.snapshot()._1},""" +
        s""""pressure_evicted_total":${EvictionClock.pressureSnapshot()},""" +
        s""""unpersisted_rdds_total":${EvictionClock.snapshot()._2},""" +
        s""""sf":"$sfDir","cpus":$cpus,"serde_msgs":${conf.totalMensagens},""" +
        s""""avro_e2e_msgs_per_sec":${num(msgsPerSecAvro, 1)}}"""
    val headline =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,""" +
        tailFields
    val full =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,""" +
        s""""queries_median":$qmedians,"detail":$detail,""" + tailFields
    // atomic publish (round-7 verdict #2: a reader racing the write —
    // or a kill mid-write — must see either the previous complete
    // artifact or the new one, never a truncated file): temp file in
    // the target directory, then rename
    val outPath = benchOutPath.toAbsolutePath
    try {
      val tmpFile = java.nio.file.Files.createTempFile(
        outPath.getParent, ".bench_out_", ".tmp")
      java.nio.file.Files.writeString(tmpFile, full + "\n")
      java.nio.file.Files.move(tmpFile, outPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    catch { case e: Exception => System.err.println(s"[bench] write $outPath: $e") }
    (headline, full)
  }
}
