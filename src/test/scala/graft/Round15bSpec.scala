package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Engine-side invariants for the round-15 second batch (q245–q249,
  * sq26) — the properties the DuckDB hash gate can't see:
  *  - q245: the peel really reaches the k-core fixpoint (checked
  *    against an in-memory reference peel of the same edge set);
  *  - q247: flagged events genuinely clear the Z-sigma bar under an
  *    independent double-precision recompute;
  *  - q248: the emitted bin ids reproduce the greedy
  *    prefix-sum-div-target rule from the output's own byte columns;
  *  - q249: crafted containers — run-length filtering and island
  *    numbering on known waveforms;
  *  - sq26: the streamed full outer join emits BOTH unmatched sides,
  *    exactly once each, and nothing newer than the final watermark
  *    on the purchase-residual leg. */
class Round15bSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round15b-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ------------------------------------------------------ q245 k-core

  test("q245: peel output is the true k-core of the co-occurrence " +
    "graph (reference peel agrees; fixpoint holds)") {
    import graft.queries.RelOps
    val edges = RelOps.cooccurEdges(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference peel, in memory
    val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (x, y) =>
      adj.getOrElseUpdate(x, scala.collection.mutable.Set[Long]()) += y
      adj.getOrElseUpdate(y, scala.collection.mutable.Set[Long]()) += x
    }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val keep = alive.filter(u => adj(u).count(alive.contains) >= RelOps.KCoreK)
      changed = keep.size != alive.size
      alive = keep
    }
    val expected = alive.map(u => u -> adj(u).count(alive.contains).toLong).toMap
    val got = RelOps.q245Kcore(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "engine peel must equal the reference k-core")
    // fixpoint: within-core degree >= K for every survivor
    assert(got.values.forall(_ >= RelOps.KCoreK))
    // the peel actually removed something (the test is not vacuous)
    assert(got.size < adj.size && got.nonEmpty)
  }

  // --------------------------------------------- q246 l-diversity

  test("q246: output equals an independent Spark-SQL recompute of the " +
    "diversity algebra (distinct-l, exposure, worst skew)") {
    import graft.queries.PipelineOps
    val out = PipelineOps.q246LDiversity(spark, sf01).collect()
    assert(out.nonEmpty && out.exists(_.getLong(3) > 0),
      "fixture should contain under-diverse groups")
    spark.read.parquet(s"$sf01/documents.parquet")
      .createOrReplaceTempView("r15b_docs")
    val exp = spark.sql(
      s"""WITH cells AS (
         |  SELECT source, n_chars div ${PipelineOps.KAnonBand} AS band,
         |    lang, count(*) AS ln
         |  FROM r15b_docs GROUP BY 1, 2, 3
         |), g AS (
         |  SELECT source, band, count(*) AS l, sum(ln) AS gn,
         |    max(ln) AS maxf
         |  FROM cells GROUP BY 1, 2
         |)
         |SELECT source, count(*) AS n_groups, min(l) AS min_l,
         |  sum(CASE WHEN l < ${PipelineOps.LDivL} THEN 1 ELSE 0 END)
         |    AS n_groups_below_l,
         |  sum(CASE WHEN l < ${PipelineOps.LDivL} THEN gn ELSE 0 END)
         |    AS n_docs_exposed,
         |  round(max(CAST(maxf AS DOUBLE) / gn), 6) AS worst_skew
         |FROM g GROUP BY source ORDER BY source""".stripMargin).collect()
    assert(out.map(_.toSeq).toSeq == exp.map(_.toSeq).toSeq)
  }

  // ------------------------------------------- q247 seasonal residuals

  test("q247: every flagged event clears the Z-sigma bar under an " +
    "independent double recompute; no under-populated cell is flagged") {
    import graft.queries.MiningOps
    val flagged = MiningOps.q247SeasonalResiduals(spark, sf01).collect()
    assert(flagged.nonEmpty, "sf0.01 fixture is expected to contain anomalies")
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$sf01/events.parquet"))
      .select(col("event_id"), col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hr"),
        col("value"))
    val stats = e.groupBy("event_type", "dow", "hr")
      .agg(count(lit(1)).as("n"), avg("value").as("mu"),
        stddev_pop("value").as("sd"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    flagged.foreach { r =>
      val key = (r.getString(1), r.getLong(2), r.getLong(3))
      val (n, mu, sd) = stats(key)
      assert(n >= MiningOps.SeasMinN, s"cell $key under-populated but flagged")
      // centi-scaling the test statistic can move the boundary by a
      // hair; 2.9 sigma is the loose double-precision floor for Z=3
      assert(math.abs(r.getDouble(4) - mu) > 2.9 * sd,
        s"event ${r.getLong(0)} flagged but only ${math.abs(r.getDouble(4) - mu) / sd} sigma")
      assert(r.getLong(5) == n)
    }
  }

  // ------------------------------------------- q248 compaction planner

  test("q248: bin ids reproduce the greedy prefix-sum rule and are " +
    "nondecreasing in partition order") {
    import graft.queries.MiningOps
    val rows = MiningOps.q248CompactionBins(spark, sf01).collect()
    assert(rows.length > 10, "monthly inventory expected")
    var cum = 0L
    var lastBin = -1L
    rows.foreach { r =>
      val bin = cum / MiningOps.CompactTargetBytes
      assert(r.getLong(3) == bin,
        s"month ${r.getLong(0)}: bin ${r.getLong(3)} != recomputed $bin")
      assert(bin >= lastBin, "bins must be nondecreasing in month order")
      lastBin = bin
      cum += r.getLong(2)
    }
    // the plan actually coalesces (more than one month per bin on
    // average) AND cuts more than one bin
    assert(lastBin >= 1 && rows.length > lastBin + 1)
  }

  // --------------------------------------------- q249 audio segments

  test("q249: crafted waveform — island numbering, blip filtering, " +
    "exact integer energy") {
    import graft.llmops.MultimodalOps
    val s = spark
    import s.implicits._
    // 6 windows: loud, silent, loud, loud, silent, loud
    //   loud   = 64 bytes of 0x00 → e = 64 * 128^2 = 1048576 > 350000
    //   silent = 64 bytes of 0x80 → e = 0
    val loud = Array.fill(MultimodalOps.FrameSize)(0x00.toByte)
    val silent = Array.fill(MultimodalOps.FrameSize)(0x80.toByte)
    val header: Array[Byte] = "GRFT".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 1, 0, 1, 0, 6) // kind=audio, w=1, h=1, nf=6
    val content = header ++ loud ++ silent ++ loud ++ loud ++ silent ++ loud
    val df = Seq((7L, content)).toDF("media_id", "content")
    val segs = MultimodalOps.audioSegmentsOf(df).collect()
    // runs {0}, {2,3}, {5}: only the length-2 run survives MinSegWin
    assert(segs.length == 1)
    val r = segs.head
    assert(r.getLong(0) == 7L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L, "start/end windows")
    assert(r.getLong(4) == 2L, "segment width")
    assert(r.getLong(5) == 2L * 64 * 128 * 128, "exact energy mass")
    // all-silent clip: no segments at all
    val quiet = Seq((8L, header ++ Array.fill(6)(silent).flatten))
      .toDF("media_id", "content")
    assert(MultimodalOps.audioSegmentsOf(quiet).count() == 0)
  }

  test("q249 vs q85: segment table aggregates back to q85's counters " +
    "for clips whose runs all survive the width filter") {
    import graft.llmops.MultimodalOps
    val segs = MultimodalOps.q249AudioSegments(spark, "")
      .groupBy("media_id")
      .agg(count(lit(1)).as("segs"), sum("n_windows").as("voiced"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val q85 = MultimodalOps.q85AudioEnergy(spark, "").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap
    // q249 drops blips, so per clip: segs <= q85.n_segments and
    // voiced-in-segments <= q85.n_voiced, with equality iff no blip
    segs.foreach { case (id, (ns, nv)) =>
      val (n85s, n85v) = q85(id)
      assert(ns <= n85s && nv <= n85v, s"clip $id inconsistent with q85")
      assert(nv >= ns * MultimodalOps.MinSegWin, "every segment is wide enough")
    }
    assert(segs.nonEmpty)
  }

  // ---------------------------------------------- q250 TF-IDF terms

  test("q250: corpus-wide tokens score exactly zero and never " +
    "outrank a discriminative term; the top-k window is group-limit " +
    "pushed") {
    import graft.llmops.TextOps
    val out = TextOps.q250TfidfTerms(spark, sf01)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=K must push the per-source limit map-side")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // rank-1 terms are strictly discriminative (score > 0): a token in
    // EVERY source has idf = ln(1) = 0 and cannot top a source's list
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getDouble(4) > 0.0, s"source ${r.getString(0)} top term has zero score")
    }
    // scores are nonincreasing within a source (the window order)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---------------------------------------------- q251 salt planner

  test("q251: every planned key satisfies the hot rule and its factor " +
    "brings shards back under the mean") {
    import graft.queries.MiningOps
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
    val nRows = li.count()
    val nKeys = li.select("l_orderkey").distinct().count()
    val rows = MiningOps.q251SaltPlanner(spark, sf01).collect()
    assert(rows.nonEmpty, "fixture has keys above 1.5x the mean")
    rows.foreach { r =>
      val (cnt, factor) = (r.getLong(1), r.getLong(2))
      assert(cnt * nKeys * MiningOps.SaltHotDen > nRows * MiningOps.SaltHotNum,
        s"key ${r.getLong(0)} emitted but not hot")
      // ceil(cnt/mean) = factor ⟹ cnt/factor <= mean (shards fit)
      assert(cnt * nKeys <= factor * nRows,
        s"key ${r.getLong(0)}: factor $factor leaves shards above the mean")
      assert(factor >= 2, "a hot key needs at least a 2-way split")
    }
    // completeness: no hot key is missing from the plan
    val expectedHot = li.groupBy("l_orderkey").count()
      .filter(col("count") * nKeys * MiningOps.SaltHotDen >
        lit(nRows) * MiningOps.SaltHotNum).count()
    assert(rows.length.toLong == expectedHot)
  }

  // --------------------------------------------- q252 noised release

  test("q252: released counts stay within the noise bound, small " +
    "groups are suppressed, and the draw is deterministic") {
    import graft.queries.PipelineOps
    val out = PipelineOps.q252NoisedRelease(spark, sf01).collect()
    assert(out.nonEmpty)
    val truth = spark.read.parquet(s"$sf01/documents.parquet")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val released = out.map(r => (r.getString(0), r.getString(1))).toSet
    out.foreach { r =>
      val n = truth((r.getString(0), r.getString(1)))
      assert(n >= PipelineOps.KAnonK, "suppression rule violated")
      assert(math.abs(r.getLong(2) - n) <= PipelineOps.NoiseB,
        s"released ${r.getLong(2)} vs true $n exceeds the bound")
    }
    truth.foreach { case (k, n) =>
      if (n < PipelineOps.KAnonK)
        assert(!released.contains(k), s"small group $k must be suppressed")
    }
    // deterministic: a second evaluation draws the identical noise
    val again = PipelineOps.q252NoisedRelease(spark, sf01).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  // -------------------------------------------------- q253 listagg

  test("q253: the aggregated cell is exactly the rank-ordered names, " +
    "bounded by K") {
    import graft.queries.SqlSurfaceOps
    val rows = SqlSurfaceOps.q253Listagg(spark, sf01).collect()
    assert(rows.nonEmpty)
    val c = spark.read.parquet(s"$sf01/customer.parquet")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_name").asc)
    val expected = c.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SqlSurfaceOps.ListaggTopK)
      .orderBy("c_mktsegment", "rk")
      .collect().groupBy(_.getString(4))
      .map { case (seg, rs) =>
        seg -> rs.sortBy(_.getAs[Int]("rk")).map(_.getString(1)).mkString(",")
      }
    rows.foreach { r =>
      assert(r.getLong(1) <= SqlSurfaceOps.ListaggTopK)
      assert(r.getString(2) == expected(r.getString(0)),
        s"segment ${r.getString(0)}: cell order must follow the rank")
    }
  }

  // ------------------------------------- q254 approx_top_k certification

  test("q254: certified cut equals the exact top-K under the tie " +
    "discipline; the lossy sketch regime honors the frequent-items " +
    "bounds") {
    import graft.llmops.TextOps
    val out = TextOps.q254ApproxTopkCert(spark, sf01).collect()
    assert(out.length == TextOps.SketchTopK)
    assert(out.forall(_.getBoolean(4)), "gate regime is lossless: bounds hold")
    // independent exact recompute with the same tie-break
    spark.read.parquet(s"$sf01/documents.parquet")
      .createOrReplaceTempView("r15b_docs254")
    val exact = spark.sql(
      s"""SELECT token, n FROM (
         |  SELECT token, count(*) AS n,
         |    row_number() OVER (ORDER BY count(*) DESC, token) AS rk
         |  FROM (SELECT explode(split(text, '\\\\s+')) AS token
         |        FROM r15b_docs254) GROUP BY token)
         |WHERE rk <= ${TextOps.SketchTopK} ORDER BY rk""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(r => (r.getString(1), r.getLong(3))).toSeq == exact.toSeq,
      "the 2K-then-recut must yield exactly the exact top-K")
    // lossy regime: capacity 4 over a skewed stream — estimates never
    // undercount and overcount at most ceil(N/capacity)
    val s2 = spark
    import s2.implicits._
    val stream = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 30).map(i => s"cold$i")).toDF("t")
    val skRows = stream.agg(expr("approx_top_k(t, 2, 4)").as("sk"))
      .selectExpr("explode(sk) AS e").selectExpr("e.item", "e.count").collect()
    val n = 100L
    val truth = Map("hot" -> 50L, "warm" -> 20L).withDefaultValue(1L)
    skRows.foreach { r =>
      val (item, est) = (r.getString(0), r.getLong(1))
      assert(est >= truth(item), s"$item undercounted")
      assert(est - truth(item) <= n / 4 + 1, s"$item overcounted past the bound")
    }
    assert(skRows.map(_.getString(0)).contains("hot"),
      "a >N/capacity heavy hitter can never be dropped")
  }

  // ------------------------------------------------ plan-shape pins

  test("plan pins: q247 broadcasts the seasonal profile; q253's rank " +
    "cut is group-limit pushed before the ordered agg") {
    val p247 = graft.queries.MiningOps.q247SeasonalResiduals(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(p247.contains("BroadcastHashJoin"),
      "the ≤ types×168-row profile must broadcast, never shuffle the corpus")
    val p253 = graft.queries.SqlSurfaceOps.q253Listagg(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(p253.contains("WindowGroupLimit"),
      "rank<=K must bound the listagg state map-side")
  }

  // ------------------------------------------ sq26 full outer stream join

  test("sq26: both unmatched sides emitted, keys unique, purchase " +
    "residuals bounded by the final watermark") {
    import graft.streaming.StreamOps
    val rows = StreamOps.sq26StreamFullOuter(spark, sf).collect()
    val matched = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val unClick = rows.filter(r => !r.isNullAt(1) && r.isNullAt(2))
    val unPurch = rows.filter(r => r.isNullAt(1) && !r.isNullAt(2))
    assert(matched.nonEmpty && unClick.nonEmpty && unPurch.nonEmpty,
      "fixture must exercise all three legs")
    // exactly-once: a click id appears either matched or unmatched,
    // never both; same for purchases
    val mc = matched.map(_.getLong(1)).toSet
    val uc = unClick.map(_.getLong(1)).toSet
    assert(mc.intersect(uc).isEmpty, "a click cannot be both matched and unmatched")
    val mp = matched.map(_.getLong(2)).toSet
    val up = unPurch.map(_.getLong(2)).toSet
    assert(mp.intersect(up).isEmpty, "a purchase cannot be both matched and unmatched")
    // purchase residuals only below the final watermark
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$sf/events.parquet"))
    val Array(maxC, maxP) = e
      .agg(max(when(col("event_type") === "click", unix_micros(col("ts")))),
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val wmUs = math.min(maxC, maxP) - 2L * 3600 * 1000000
    val pTs = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    unPurch.foreach { r =>
      assert(pTs(r.getLong(2)) < wmUs,
        s"purchase ${r.getLong(2)} emitted as unmatched above the watermark")
    }
  }
}
