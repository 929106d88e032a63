package graft

import graft.queries.PipelineOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 corpus-lifecycle operators: the semantic invariants the
  * DuckDB hash-gate can't express — the diff classes partition both
  * snapshots, the two-phase budget selection equals the naive global
  * prefix, PSI's sign/zero structure. */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("pipeline-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  test("q173: diff classes partition the union of both snapshots, counts match the mutation rule") {
    val out = PipelineOps.q173CorpusDiff(spark, dir).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val added = ids.count(_ % 11 == 0).toLong
    val removed = ids.count(_ % 13 == 0).toLong
    // appending ' [rev2]' always changes the digest, so changed is
    // exactly the re-crawled survivors
    val changed = ids.count(i => i % 13 != 0 && i % 7 == 0).toLong
    val unchanged = ids.count(i => i % 13 != 0 && i % 7 != 0).toLong
    assert(out.getOrElse("added", 0L) === added)
    assert(out.getOrElse("removed", 0L) === removed)
    assert(out.getOrElse("changed", 0L) === changed)
    assert(out.getOrElse("unchanged", 0L) === unchanged)
    // partition: every (doc_id, side) pair lands in exactly one class
    assert(out.values.sum === ids.length + added)
  }

  test("q174: two-phase bucket selection equals the naive global cumulative window") {
    val out = PipelineOps.q174TokenBudgetSelect(spark, dir).collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_selected"),
          r.getAs[Long]("sel_tokens")))).toMap
    // the naive formulation the two-phase plan must reproduce exactly:
    // one global (score DESC, doc_id) running sum
    val tok = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .withColumn("score",
        round(col("nu").cast("double") / col("nt"), PipelineOps.ScoreDp))
    val budget = tok.agg(graft.functions.GraftFunctions
        .idiv(sum("nt"), lit(PipelineOps.BudgetDenom.toLong)))
      .head().getLong(0)
    val wg = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = tok.withColumn("cum", sum("nt").over(wg))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum") <= budget, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("cum") <= budget, col("nt")).otherwise(0L)).as("sel_tokens"))
      .collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_selected"),
          r.getAs[Long]("sel_tokens")))).toMap
    assert(out === naive)
    // the budget is respected globally and the selection is non-empty
    val selTotal = out.values.map(_._3).sum
    assert(selTotal <= budget)
    assert(out.values.map(_._2).sum > 0)
  }

  test("q173 plan: the diff join moves digests, never document bodies") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = PipelineOps.q173CorpusDiff(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // the full-outer (and any inner) join inputs must be the projected
    // (doc_id, digest, length) sides — a `text` attribute crossing a
    // join means bodies went over the wire
    joins.foreach { j =>
      j.children.foreach { c =>
        assert(!c.output.exists(_.name == "text"),
          s"document bodies must not cross the diff join:\n$j")
      }
    }
  }

  test("q174 plan: the only global window runs on the bucket frame, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = PipelineOps.q174TokenBudgetSelect(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, "the exclusive bucket prefix is a global window")
    global.foreach { w =>
      assert(!w.child.output.exists(_.name == "doc_id"),
        s"the global window must consume the per-score bucket aggregate " +
          s"(tiny frame), never per-doc rows:\n$w")
    }
    // the per-doc running sum stays partitioned (distributed)
    assert(wins.exists(_.partitionSpec.nonEmpty))
  }

  test("q176: exactly k per stratum, reproducible, rank pushed down as WindowGroupLimit") {
    val df = PipelineOps.q176BottomkSample(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-source bottom-k must push below the full sort:\n$plan")
    val rows = df.collect()
    val perSource = rows.groupBy(_.getAs[String]("source"))
    val nPerSource = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    perSource.foreach { case (src, rs) =>
      assert(rs.length === math.min(PipelineOps.SampleK, nPerSource(src).toInt))
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1L to rs.length.toLong))
    }
    // reproducible: a second run returns the identical sample
    val again = PipelineOps.q176BottomkSample(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q177: novelty counts only digest-changed docs and never exceeds the gram total") {
    val rows = PipelineOps.q177CrawlNovelty(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nov) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))
      assert(nov >= 0 && nov <= n)
      // the [rev2] suffix introduces novel trigrams wherever a changed
      // doc exists, so rates stay within [0, 1]
      val rate = r.getAs[Double]("novelty_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // every source has changed or added docs under the mutation rule,
    // and the appended '[rev2]' trigram is novel by construction —
    // so total novelty is strictly positive
    assert(rows.map(_.getAs[Long]("n_novel")).sum > 0)
  }

  test("sq21: streaming band counts + batch PSI equals the batch twin day-for-day") {
    val out = graft.streaming.StreamOps.sq21StreamPsiMonitor(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0)
      assert(r.getAs[Boolean]("drifted") === (psi >= PipelineOps.PsiThresh))
    }
    // closed-day discipline: every emitted day ends at or before the
    // final watermark (max ts - 2h)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val maxMs = graft.sources.TsBridge.normalize(ev)
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val wmMs = maxMs - 2L * 3600 * 1000
    out.foreach { r =>
      assert(r.getAs[Long]("janela_ms") + 86400000L <= wmMs,
        "append mode must emit only watermark-closed days")
    }
  }

  test("q178: iter-1 loss is ln 2, training monotonically improves, plan is pure aggregate") {
    val df = PipelineOps.q178LrQuality(spark, dir)
    // scale pin: each GD step is ONE scalar aggregate over the feature
    // scan — no join, no window, nothing that shuffles per-doc rows
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val step = PipelineOps.q178LrQuality(spark, dir) // plan inspected below
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("iter")).toSeq === Seq(1L, 2L, 3L))
    // w = 0 → p = 0.5 everywhere → start-of-step loss is exactly ln 2
    assert(rows(0).getAs[Double]("logloss") === 0.693147)
    // full-batch GD at this rate on a convex loss strictly improves
    assert(rows(2).getAs[Double]("logloss") < rows(0).getAs[Double]("logloss"))
    // the /10 feature scaling keeps the weight path bounded
    rows.foreach { r =>
      Seq("w0", "w1", "w2", "w3").foreach(c =>
        assert(math.abs(r.getAs[Double](c)) <= 2.0))
    }
    // bit-for-bit reproducible (exact-decimal gradients, gridded sigmoid)
    val again = PipelineOps.q178LrQuality(spark, dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
    val lp = step.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join => j }.isEmpty)
    assert(lp.collect { case w: LWindow => w }.isEmpty)
  }

  test("q179: midrank AUC equals the brute-force pairwise statistic") {
    val out = PipelineOps.q179AucMidrank(spark, dir).collect()
    assert(out.nonEmpty)
    // brute force P(score_pos > score_neg) + 0.5·P(tie), per source
    val scored = docs
      .select(col("source"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .select(col("source"),
        round(col("nu").cast("double") / col("nt"), PipelineOps.LrFeatDp)
          .as("sc"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("sc"),
        r.getAs[Long]("y")))
      .groupBy(_._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = scored(src)
      val pos = xs.filter(_._3 == 1L).map(_._2)
      val neg = xs.filter(_._3 == 0L).map(_._2)
      assert(r.getAs[Long]("n_pos") === pos.length.toLong)
      assert(r.getAs[Long]("n_neg") === neg.length.toLong)
      if (pos.nonEmpty && neg.nonEmpty) {
        val u = (for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val brute = u / (pos.length.toDouble * neg.length)
        assert(math.abs(r.getAs[Double]("auc") - brute) <= 1e-6,
          s"$src: midrank ${r.getAs[Double]("auc")} vs pairwise $brute")
      } else assert(r.isNullAt(r.fieldIndex("auc")),
        s"$src: degenerate class split must yield NULL AUC")
    }
    // scale pin: ranking runs on the bucket aggregate, partitioned by
    // source — never an unpartitioned window, never per-doc rows
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = PipelineOps.q179AucMidrank(spark, dir)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "AUC window must be per-source")
      assert(!w.child.output.exists(_.name == "lang"),
        "AUC window must consume the bucket aggregate, not per-doc rows")
    }
  }

  test("q180: bins partition the corpus per scorer, means sit in their band, Brier recomposes") {
    val out = PipelineOps.q180Calibration(spark, dir).collect()
    val byScorer = out.groupBy(_.getAs[String]("scorer"))
    assert(byScorer.keySet === Set("model", "raw"))
    val nDocs = docs
      .select(size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .filter(col("nt") > 0).count()
    byScorer.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("n")).sum === nDocs)
    }
    // the raw heuristic spans bands (that spread IS the contrast the
    // report exists to show)
    assert(byScorer("raw").length >= 2)
    out.foreach { r =>
      val (bin, n) = (r.getAs[Int]("bin"), r.getAs[Long]("n"))
      assert(bin >= 0 && bin < PipelineOps.CalBins && n > 0)
      val avgP = r.getAs[Double]("avg_p")
      // the band mean must sit inside its band (clamp + rounding slack)
      assert(avgP >= bin / 10.0 - 1e-5 && avgP <= (bin + 1) / 10.0 + 1e-5)
      val frac = r.getAs[Double]("frac_pos")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(avgP - frac)) <= 2e-6)
      assert(r.getAs[Double]("brier") >= 0.0 && r.getAs[Double]("brier") <= 1.0)
    }
    // per scorer, the count-weighted band Brier equals the global
    // mean (p − y)² recomputed brute-force
    val w = PipelineOps.q178LrQuality(spark, dir).collect().last
    val ws = Seq("w0", "w1", "w2", "w3").map(w.getAs[Double])
    val perDoc = docs
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .collect().map { r0 =>
        val y = if (r0.getAs[String]("lang") == "en") 1.0 else 0.0
        def r4(x: Double) =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val x1 = r4(r0.getAs[Long]("nu").toDouble / r0.getAs[Long]("nt"))
        val x2 = r4(math.log(r0.getAs[Long]("n_chars") + 1.0) / 10.0)
        val x3 = r4(math.log(r0.getAs[Long]("nt") + 1.0) / 10.0)
        val m = ws(0) + ws(1) * x1 + ws(2) * x2 + ws(3) * x3
        val p0 = BigDecimal(1.0 / (1.0 + math.exp(-m)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        def clamp(p: Double) = math.max(1e-6, math.min(1 - 1e-6, p))
        (sq(clamp(p0) - y), sq(clamp(x1) - y))
      }
    Seq("model" -> perDoc.map(_._1), "raw" -> perDoc.map(_._2)).foreach {
      case (scorer, sqs) =>
        val rs = byScorer(scorer)
        val wBrier = rs.map(r =>
          r.getAs[Long]("n") * r.getAs[Double]("brier")).sum / nDocs
        assert(math.abs(wBrier - sqs.sum / sqs.length) <= 1e-5,
          s"$scorer: weighted band Brier $wBrier vs global ${sqs.sum / sqs.length}")
    }
  }

  private def sq(x: Double): Double = x * x

  test("q181: allocation equals the greedy waterfill simulation, budget exhausts exactly") {
    val out = PipelineOps.q181EpochAlloc(spark, dir).collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("avail"), r.getAs[Long]("rep"), r.getAs[Long]("cap"),
          r.getAs[Long]("alloc")))).toMap
    assert(out.nonEmpty)
    // brute force: the sequential waterfill loop the closed form must equal
    val srcs = out.toSeq.map { case (s0, (avail, rep, cap, _)) =>
      assert(cap === avail * rep)
      (s0, cap)
    }.sortBy { case (s0, cap) => (cap, s0) }
    val totalAvail = out.values.map(_._1).sum
    val budget = totalAvail * PipelineOps.EpochBudgetNum / PipelineOps.EpochBudgetDen
    var rem = budget
    var slots = srcs.length.toLong
    val expected = scala.collection.mutable.Map[String, Long]()
    var uncapped = List.empty[String]
    srcs.foreach { case (s0, cap) =>
      if (uncapped.isEmpty && cap * slots <= rem) {
        expected(s0) = cap; rem -= cap; slots -= 1
      } else uncapped = uncapped :+ s0
    }
    if (uncapped.nonEmpty) {
      val share = rem / uncapped.length
      val r = rem - share * uncapped.length
      uncapped.zipWithIndex.foreach { case (s0, k) =>
        expected(s0) = share + (if (k < r) 1L else 0L)
      }
    }
    out.foreach { case (s0, (_, _, cap, alloc)) =>
      assert(alloc === expected(s0), s"$s0: $alloc vs ${expected(s0)}")
      assert(alloc <= cap)
    }
    // the budget is spent exactly (or the corpus caps out below it)
    val spent = out.values.map(_._4).sum
    assert(spent === math.min(budget, out.values.map(_._3).sum))
  }

  test("q182: two-phase shard manifest equals the naive global shuffle, shards contiguous and balanced") {
    val out = PipelineOps.q182TrainShuffle(spark, dir).collect()
      .sortBy(_.getAs[Long]("shard"))
    assert(out.nonEmpty)
    // brute force: collect (key, nt), sort by key, cut into shards
    val keyed = docs
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        md5(concat(lit(s"${PipelineOps.ShuffleSeed}-"),
          col("doc_id").cast("string"))).as("k"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("nt")))
      .sortBy(_._1)
    val total = keyed.length.toLong
    val expected = keyed.zipWithIndex
      .groupBy { case (_, i) => i.toLong * PipelineOps.NShards / total }
      .toSeq.sortBy(_._1)
      .map { case (sh, rows) =>
        (sh, rows.length.toLong, rows.map(_._1._2).sum,
          rows.map(_._1._1).min, rows.map(_._1._1).max)
      }
    val got = out.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_tokens"), r.getAs[String]("key_lo"),
      r.getAs[String]("key_hi")))
    assert(got.toSeq === expected)
    // floor/ceil balance and non-overlapping ascending key ranges
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"shard ${a._1} key range must end before shard ${b._1} begins")
      case _ =>
    }
    // reproducible: a second run is bit-for-bit identical
    val again = PipelineOps.q182TrainShuffle(spark, dir).collect()
      .sortBy(_.getAs[Long]("shard"))
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("key_lo"),
        r.getAs[String]("key_hi")))
    assert(again.toSeq === got.toSeq)
  }

  test("q182 plan: no corpus-scale global window — the only unpartitioned window runs on the bucket frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = PipelineOps.q182TrainShuffle(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, "the exclusive bucket prefix is a global window")
    global.foreach { w =>
      assert(!w.child.output.exists(_.name == "doc_id"),
        s"the global window must consume the 256-row bucket aggregate, " +
          s"never per-doc rows:\n$w")
    }
    // the per-doc rank stays partitioned by the key's leading byte
    assert(wins.exists(_.partitionSpec.nonEmpty))
  }

  test("q183: pairs are per-group best-vs-worst with positive margin, ranks push down as WindowGroupLimit") {
    val df = PipelineOps.q183PreferencePairs(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the per-group rank-j cut must prune below the sort:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // brute force the j=1 pair per source from the same scoring
    val scored = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .withColumn("score",
        round(col("nu").cast("double") / col("nt"), PipelineOps.ScoreDp))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score")))
      .groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val grp = scored(src)
      val cs = r.getAs[Double]("chosen_score")
      val rs = r.getAs[Double]("rejected_score")
      assert(cs > rs)
      assert(r.getAs[Long]("chosen_id") !== r.getAs[Long]("rejected_id"))
      assert(math.abs(r.getAs[Double]("margin") - BigDecimal(cs - rs)
        .setScale(PipelineOps.ScoreDp, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
      if (r.getAs[Int]("j") == 1) {
        val best = grp.minBy(t => (-t._3, t._2))
        val worst = grp.minBy(t => (t._3, -t._2))
        assert(r.getAs[Long]("chosen_id") === best._2)
        assert(r.getAs[Long]("rejected_id") === worst._2)
      }
    }
    // at most PrefPairsPerGroup pairs per group
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.length <= PipelineOps.PrefPairsPerGroup)
    }
  }

  test("q185: group accounting partitions each source and matches the brute-force audit") {
    val out = PipelineOps.q185KAnonymity(spark, dir).collect()
    assert(out.nonEmpty)
    val brute = docs
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars") / PipelineOps.KAnonBand))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      .groupBy(_._1._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val groups = brute(src).values
      assert(r.getAs[Long]("n_docs") === groups.sum)
      assert(r.getAs[Long]("n_groups") === groups.size.toLong)
      val below = groups.filter(_ < PipelineOps.KAnonK)
      assert(r.getAs[Long]("n_groups_below_k") === below.size.toLong)
      assert(r.getAs[Long]("n_docs_below_k") === below.sum)
      assert(r.getAs[Long]("min_group") === groups.min)
      // risk is a fraction of the source's own docs
      val rr = r.getAs[Double]("risk_ratio")
      assert(rr >= 0.0 && rr <= 1.0)
    }
  }

  test("q186: mask geometry matches the per-position simulation, spans partition masked tokens") {
    val out = PipelineOps.q186SpanCorruption(spark, dir).collect()
    assert(out.nonEmpty)
    val brute = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n"))
      .filter(col("n") > 0).collect()
      .map { r =>
        val d = r.getAs[Long]("doc_id"); val n = r.getAs[Long]("n")
        def m(p: Long) = (p + d) % PipelineOps.CorruptMod < PipelineOps.CorruptWidth
        val ps = (0L until n)
        (r.getAs[String]("source"), n, ps.count(m).toLong,
          ps.count(p => m(p) && (p == 0L || !m(p - 1))).toLong)
      }.groupBy(_._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val g = brute(src)
      assert(r.getAs[Long]("n_tokens") === g.map(_._2).sum)
      assert(r.getAs[Long]("n_masked") === g.map(_._3).sum)
      assert(r.getAs[Long]("n_spans") === g.map(_._4).sum)
      // runs of CorruptWidth: mean span length sits in (1, width]
      val mean = r.getAs[Double]("mean_span")
      assert(mean > 1.0 && mean <= PipelineOps.CorruptWidth + 1e-9)
      val rate = r.getAs[Double]("mask_rate")
      // ~width/mod, loose band for boundary effects on short docs
      assert(rate > 0.15 && rate < 0.45)
    }
  }

  test("q186 plan: position arithmetic fuses into the scan — no explode, no join, one shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val df = PipelineOps.q186SpanCorruption(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case g: Generate => g }.isEmpty,
      "per-position work must be HOF filters over the in-row range, never an explode")
    assert(plan.collect { case j: Join => j }.isEmpty)
    val exchanges = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"one partial-agg shuffle (+1 for the final sort) expected:\n$exchanges")
  }

  test("q187: every dup group contributes exactly one doc's worth of tokens, unique corpus is discount 1") {
    val out = PipelineOps.q187SoftDedupWeights(spark, dir).collect()
    assert(out.nonEmpty)
    // brute force from the same fingerprints
    val rows = docs
      .select(col("source"), md5(col("text")).as("fp"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .filter(col("nt") > 0).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("fp"),
        r.getAs[Long]("nt")))
    val copies = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val bySrc = rows.groupBy(_._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      assert(r.getAs[Long]("n_docs") === g.length.toLong)
      assert(r.getAs[Long]("n_dup_docs") ===
        g.count(t => copies(t._2) > 1).toLong)
      assert(r.getAs[Long]("raw_tokens") === g.map(_._3).sum)
      val eff = g.map(t => BigDecimal(t._3.toDouble / copies(t._2))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(math.abs(r.getAs[Double]("effective_tokens") -
        eff.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
      val disc = r.getAs[Double]("dedup_discount")
      assert(disc > 0.0 && disc <= 1.0)
    }
    // global invariant: every dup group's weighted mass is ONE copy's
    // tokens — the whole point of soft dedup
    val globalEff = out.map(r => r.getAs[Double]("effective_tokens")).sum
    val expectedEff = rows.groupBy(_._2).values
      .map(g => g.map(_._3.toDouble / g.length).sum).sum
    assert(math.abs(globalEff - expectedEff) < 1e-3)
  }

  test("q188: importance weights match the brute-force hashed profiles, target source scores target-like, profiles broadcast") {
    val df = PipelineOps.q188DsirWeights(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the ≤1024-row llr profile must broadcast to the scoring join:\n$plan")
    val out = df.collect()
    assert(out.nonEmpty)
    // brute force with java MD5 (same hex prefix parse both engines do)
    val mdHex = (t: String) => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      d.take(2).map("%02x".format(_)).mkString
    }
    val toks = docs.select(col("doc_id"), col("source"), col("text")).collect()
      .flatMap { r =>
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty).map(t =>
          (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
            java.lang.Long.parseLong(mdHex(t), 16) % PipelineOps.DsirBuckets))
      }
    val ca = toks.groupBy(_._3).map { case (b, v) => b -> v.length.toLong }
    val ct = toks.filter(_._2 == PipelineOps.DsirTarget)
      .groupBy(_._3).map { case (b, v) => b -> v.length.toLong }
    val na0 = ca.values.sum; val nt0 = ct.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val llr = ca.map { case (b, c) =>
      b -> r6(math.log(((ct.getOrElse(b, 0L) + 1).toDouble
        / (nt0 + PipelineOps.DsirBuckets))
        / ((c + 1).toDouble / (na0 + PipelineOps.DsirBuckets))))
    }
    val perDoc = toks.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((_, src), v) => (src, v.map(t => llr(t._3)).sum) }
    val bySrc = perDoc.groupBy(_._1)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src).toSeq
      assert(r.getAs[Long]("n_docs") === g.length.toLong)
      assert(r.getAs[Long]("n_target_like") ===
        g.count(_._2 > 0).toLong)
      val mean = (g.map(_._2).sum / g.length).toDouble
      assert(math.abs(r.getAs[Double]("mean_llr") - mean) < 1e-6,
        s"$src: ${r.getAs[Double]("mean_llr")} vs $mean")
    }
    // the driver fixture shares ONE vocabulary across sources (no
    // domain signal — mean llr is dominated by doc length), so the
    // separation claim runs on a corpus that HAS domains: disjoint
    // vocabularies → target docs positive, others negative, exactly
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val mk = (i: Long, txt: String, src: String) =>
      Row(i, txt, "en", src, txt.length.toLong)
    val rows = (
      (0L until 4L).map(i => mk(i, "alpha beta gamma alpha beta", PipelineOps.DsirTarget)) ++
      (4L until 10L).map(i => mk(i, "delta epsilon zeta delta epsilon", "other"))).asJava
    val d = graft.operators.PlanCache.tempDir("graft_dsir_")
    spark.createDataFrame(rows, schema).write.parquet(s"$d/documents.parquet")
    val sep = PipelineOps.q188DsirWeights(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("mean_llr"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_target_like"))).toMap
    val (tMean, tN, tLike) = sep(PipelineOps.DsirTarget)
    val (oMean, oN, oLike) = sep("other")
    assert(tMean > 0.0 && tLike === tN,
      s"disjoint-vocab target docs must all score target-like: $sep")
    assert(oMean < 0.0 && oLike === 0L,
      s"disjoint-vocab non-target docs must all score corpus-like: $sep")
  }

  test("q189: tie-aware Spearman matches the brute-force midrank Pearson, bounded by 1, self-agreement is 1") {
    val out = PipelineOps.q189RankAgreement(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), Option(r.get(r.fieldIndex("spearman_rho"))
          .asInstanceOf[java.lang.Double]).map(_.doubleValue))).toMap
    assert(out.nonEmpty)
    def midranks(xs: Seq[Double]): Seq[Double] = {
      val byVal = xs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
      xs.map(byVal)
    }
    def pearson(u: Seq[Double], v: Seq[Double]): Option[Double] = {
      val n = u.size
      val (su, sv) = (u.sum, v.sum)
      val suu = u.map(x => x * x).sum; val svv = v.map(x => x * x).sum
      val suv = u.zip(v).map { case (a, b) => a * b }.sum
      val d2 = (n * suu - su * su) * (n * svv - sv * sv)
      if (d2 <= 0) None else Some((n * suv - su * sv) / math.sqrt(d2))
    }
    val scored = docs
      .select(col("source"), col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .select(col("source"),
        round(col("nu").cast("double") / col("nt"), 4).as("u"),
        round(log(col("n_chars").cast("double") + 1d) / 10d, 4).as("v"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("u"),
        r.getAs[Double]("v")))
      .groupBy(_._1)
    out.foreach { case (src, (n, rho)) =>
      val g = scored(src)
      assert(n === g.length.toLong)
      val exp = pearson(midranks(g.map(_._2).toSeq), midranks(g.map(_._3).toSeq))
      (rho, exp) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-5, s"$src: $a vs $b")
          assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
          // a scorer perfectly agrees with itself (sanity of the
          // midrank construction, checked through the same machinery)
          val self = pearson(midranks(g.map(_._2).toSeq), midranks(g.map(_._2).toSeq))
          assert(self.forall(s0 => math.abs(s0 - 1.0) < 1e-9))
        case (None, None) => // constant scorer in both — agreement undefined
        case other => fail(s"$src: null-ness mismatch $other")
      }
    }
  }

  test("q187 plan: the copy-count join moves digests, never document bodies") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = PipelineOps.q187SoftDedupWeights(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      j.children.foreach { c =>
        assert(!c.output.exists(_.name == "text"),
          s"document bodies must not cross the dedup-weight join:\n$j")
      }
    }
  }

  test("q181/q189 plan: no window ever consumes per-doc rows — every frame is aggregate-bounded") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq(PipelineOps.q181EpochAlloc(spark, dir),
      PipelineOps.q189RankAgreement(spark, dir)).foreach { df =>
      val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        assert(!w.child.output.exists(a => a.name == "doc_id" || a.name == "text"),
          s"windows must run on bucket/policy frames, never the corpus:\n$w")
      }
    }
  }

  test("q190: the sweep is a monotone CDF anchored at full retention, and the corpus is touched once") {
    val df = PipelineOps.q190RetentionSweep(spark, dir)
    // the only corpus-scale work is ONE aggregate: the grid join runs
    // against the bucket table, so at most one scan of documents
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("documents.parquet"))
    assert(scans <= 2, s"grid must join buckets, not re-scan the corpus: $scans")
    val rows = df.collect().sortBy(_.getAs[Double]("cutoff"))
    assert(rows.length === PipelineOps.SweepSteps)
    // cutoff 0.0 retains everything
    assert(rows.head.getAs[Double]("doc_frac") === 1.0)
    assert(rows.head.getAs[Double]("token_frac") === 1.0)
    // monotone non-increasing in the cutoff
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs"))
        assert(a.getAs[Long]("n_tokens") >= b.getAs[Long]("n_tokens"))
      case _ =>
    }
    // brute-force spot check at cutoff 0.5
    val half = rows.find(r => math.abs(r.getAs[Double]("cutoff") - 0.5) < 1e-9).get
    val brute = docs
      .select(size(split(col("text"), "\\s+")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), "\\s+"))).cast("long").as("nu"))
      .filter(col("nt") > 0)
      .withColumn("score",
        round(col("nu").cast("double") / col("nt"), PipelineOps.ScoreDp))
      .collect().map(r => (r.getAs[Double]("score"), r.getAs[Long]("nt")))
    assert(half.getAs[Long]("n_docs") === brute.count(_._1 >= 0.5).toLong)
    assert(half.getAs[Long]("n_tokens") ===
      brute.filter(_._1 >= 0.5).map(_._2).sum)
  }

  test("q175: PSI is non-negative, totals partition each type, and identical populations score zero") {
    val rows = PipelineOps.q175PsiDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    val events = spark.read.parquet(s"$dir/events.parquet")
    val perType = events.groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      // each band term (p_a - p_b)·ln(p_a/p_b) has matching signs, so
      // the sum can never go negative
      assert(psi >= 0.0, s"PSI must be non-negative, got $psi")
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") ===
        perType(r.getAs[String]("event_type")))
      assert(r.getAs[Boolean]("drifted") === (psi >= PipelineOps.PsiThresh))
    }
  }

  // ----------------------------------------------------------- q191

  test("q191: RRF recomputes from the leg ranks, output is rank-dense and monotone") {
    val rows = PipelineOps.q191RrfFusion(spark, dir).collect()
    assert(rows.length == PipelineOps.FuseOut)
    assert(rows.map(_.getAs[Long]("fused_rank")).toSeq ==
      (1L to PipelineOps.FuseOut).toSeq, "fused ranks are dense 1..N")
    var prev = Double.MaxValue
    rows.foreach { r =>
      val (lx, sm) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))
      assert(lx > 0 || sm > 0, "a fused doc must come from at least one leg")
      assert(lx <= PipelineOps.FuseK && sm <= PipelineOps.FuseK)
      val want = BigDecimal(
        (if (lx > 0) 1.0 / (PipelineOps.RrfK + lx) else 0.0) +
        (if (sm > 0) 1.0 / (PipelineOps.RrfK + sm) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == want, s"rrf must be Σ 1/(k+rank): $r")
      assert(r.getAs[Double]("rrf") <= prev, "rrf non-increasing down the list")
      prev = r.getAs[Double]("rrf")
    }
  }

  test("q191 plan: every global window is rank-pushed — no full-corpus sort survives") {
    // All three no-partition windows (lex top-K, sem top-K, fusion
    // top-N) sit behind a rank filter, so each must compile to a
    // top-k (TakeOrderedAndProject / WindowGroupLimit), never a
    // single-partition full Sort+Window over the corpus — the same
    // O(K)-not-O(table) claim q148/q165 pin.
    val plan = PipelineOps.q191RrfFusion(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") ||
        plan.contains("WindowGroupLimit"),
      s"q191's retriever top-Ks must be rank-pushed, got:\n$plan")
  }

  // ----------------------------------------------------------- q192

  test("q192: margins, argmax, and mutuality all match the brute-force scorer") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sequential fold, floats widened per element — the DotProduct
    // expression's association order
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val xs = emb.filter(_._3 < 5)
    val ys = emb.filter(_._3 >= 5)
    def cos(a: (Long, Array[Double], Int), b: (Long, Array[Double], Int)) = {
      val (na, nb) = (math.sqrt(dot(a._2, a._2)), math.sqrt(dot(b._2, b._2)))
      if (na * nb == 0) 0.0 else r6(dot(a._2, b._2) / (na * nb))
    }
    val simXY = xs.map(x => x._1 -> ys.map(y => y._1 -> cos(x, y)).toMap).toMap
    // exact decimal top-k sums (the DECIMAL(14,6) discipline)
    def topSum(sims: Seq[Double]) =
      sims.sorted(Ordering[Double].reverse).take(PipelineOps.MarginK)
        .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum
    val sx = xs.map(x => x._1 -> topSum(simXY(x._1).values.toSeq)).toMap
    val sy = ys.map(y => y._1 ->
      topSum(xs.map(x => simXY(x._1)(y._1)).toSeq)).toMap
    def margin(x: Long, y: Long) = {
      val den = (sx(x) + sy(y)).toDouble
      if (den > 0) r6(simXY(x)(y) * 2 * PipelineOps.MarginK / den) else 0.0
    }
    val best = xs.map(_._1).map { x =>
      val cands = ys.map(_._1).map(y => (margin(x, y), y))
      x -> cands.minBy { case (m, y) => (-m, y) }
    }.toMap
    val bestX = ys.map(_._1).map { y =>
      val cands = xs.map(_._1).map(x => (margin(x, y), x))
      y -> cands.minBy { case (m, x) => (-m, x) }
    }.toMap
    val got = PipelineOps.q192MarginAlign(spark, dir).collect()
    val want = best.filter { case (_, (m, _)) => m >= PipelineOps.MarginThresh }
    assert(got.length == want.size,
      s"aligned-pair count ${got.length} != brute force ${want.size}")
    got.foreach { r =>
      val (x, y) = (r.getAs[Long]("x_id"), r.getAs[Long]("y_id"))
      assert(best(x) == ((r.getAs[Double]("margin"), y)),
        s"x=$x must align to its best-margin y")
      assert(r.getAs[Boolean]("mutual") == (bestX(y)._2 == x),
        s"mutual flag for ($x,$y) must mean y reciprocates")
    }
  }

  // ----------------------------------------------------------- q203

  test("q203: shuffle-quality statistics equal a brute-force adjacency recompute") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def k(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"${PipelineOps.ShuffleSeed}-$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val ds = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keyed = ds.map { case (id, src) => (k(id), src) }
    val pairs = keyed.groupBy(_._1.take(2)).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(_._1).map(_._2)
      ordered.zip(ordered.drop(1))
    }
    val nPairs = pairs.length.toLong
    val nSame = pairs.count { case (a, b) => a == b }.toLong
    val byScr = ds.groupBy(_._2).map(_._2.length.toLong)
    val (sum2, n) = (byScr.map(x => x * x).sum, byScr.sum)
    val r = PipelineOps.q203ShuffleQuality(spark, dir).head()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_pairs") == nPairs)
    assert(r.getAs[Long]("n_same") == nSame)
    val pSame = nSame.toDouble / nPairs
    val expP = sum2.toDouble / (n.toDouble * n.toDouble)
    assert(r.getAs[Double]("p_same") == r6(pSame))
    assert(r.getAs[Double]("expected_p") == r6(expP))
    assert(r.getAs[Double]("clump_ratio") == r6(pSame / expP))
    // the md5 shuffle must actually decorrelate: adjacency collisions
    // within 2x of the i.i.d. expectation (a sorted-by-source order
    // would score ~n/n_pairs times the expectation)
    assert(r.getAs[Double]("clump_ratio") < 2.0,
      s"shuffle left source runs: ${r.getAs[Double]("clump_ratio")}")
  }

  // ----------------------------------------------------------- q204

  test("q204: packed context equals a brute-force greedy walk of the fused list") {
    val fused = PipelineOps.q191RrfFusion(spark, dir).collect()
      .map(r => (r.getAs[Long]("fused_rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1)
    val meta = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2).split("\\s+", -1).length.toLong))
      .toMap
    var bySrc = Map.empty[String, Int].withDefaultValue(0)
    var cum = 0L
    var pos = 0L
    val want = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Long, Long, Long)]
    var truncated = false
    fused.foreach { case (fr, id) =>
      meta.get(id).foreach { case (src, nt) =>
        if (bySrc(src) < PipelineOps.CtxPerSourceCap && !truncated) {
          bySrc = bySrc.updated(src, bySrc(src) + 1)
          // the source cap consumes its slot even when the budget
          // then cuts the doc: rs is assigned BEFORE the cum filter
          if (cum + nt <= PipelineOps.CtxBudgetTokens) {
            cum += nt
            pos += 1
            want += ((pos, id, src, nt, cum, fr))
          } else truncated = true
        }
      }
    }
    val got = PipelineOps.q204ContextPack(spark, dir).collect()
      .map(r => (r.getAs[Long]("ctx_pos"), r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("nt"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("fused_rank")))
    assert(got.toSeq == want.toSeq,
      "packed context must equal the greedy cap+budget walk")
    assert(got.nonEmpty && got.last._5 <= PipelineOps.CtxBudgetTokens)
  }

  // ----------------------------------------------------------- q205

  test("q205: coverage audit reconciles to both table counts") {
    val docIds = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val vecIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = PipelineOps.q205EmbedCoverage(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_unembedded"), r.getAs[Long]("n_orphans"),
        r.getAs[Long]("n_covered")))
    // per-source brute force
    val bySrc = docIds.groupBy(_._2).map { case (src, ds) =>
      val n = ds.length.toLong
      val cov = ds.count(d => vecIds(d._1)).toLong
      (src, n, n - cov, 0L, cov)
    }.toSeq
    val orphans = (vecIds -- docIds.map(_._1).toSet).size.toLong
    val want = (if (orphans > 0)
        bySrc :+ (("(orphan)", 0L, 0L, orphans, 0L))
      else bySrc).sortBy(_._1)
    assert(got.toSeq == want)
    // totals reconcile to both tables
    assert(got.map(_._2).sum == docIds.length)
    assert(got.map(_._5).sum + orphans == vecIds.size)
  }

  // ----------------------------------------------------------- q206

  test("q206: concentration statistics equal a brute-force recompute") {
    def rs(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val mass = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split("\\s+", -1).length.toLong))
      .groupBy(_._1).map { case (s2, rows) => s2 -> rows.map(_._2).sum }
    val xs = mass.toSeq.sortBy { case (src, x) => (x, src) }.map(_._2)
    val (k, tot) = (xs.length.toLong, xs.sum)
    val gnum = xs.zipWithIndex.map { case (x, i0) =>
      (2L * (i0 + 1) - k - 1) * x
    }.sum
    val gini = rs(gnum.toDouble / ((k - 1).toDouble * tot.toDouble), 6).toDouble
    val ent = -xs.filter(_ > 0).map { x =>
      rs(x.toDouble / tot * math.log(x.toDouble / tot), 10)
    }.sum.toDouble
    val r = PipelineOps.q206SourceConcentration(spark, dir).head()
    assert(r.getAs[Long]("n_sources") == k)
    assert(r.getAs[Long]("total_tokens") == tot)
    assert(r.getAs[Double]("gini") == gini)
    assert(r.getAs[Double]("entropy") == rs(ent, 6).toDouble)
    // eff_sources = exp of the ROUNDED entropy (both engines
    // exponentiate the same 6-dp value, then round once more)
    assert(r.getAs[Double]("eff_sources") ==
      rs(math.exp(rs(ent, 6).toDouble), 6).toDouble)
    // sanity: bounded statistics, effective count within [1, k]
    assert(gini >= 0.0 && gini <= 1.0)
    val eff = r.getAs[Double]("eff_sources")
    assert(eff >= 1.0 && eff <= k + 1e-9)
  }
}
