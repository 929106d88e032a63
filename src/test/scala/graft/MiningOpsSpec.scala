package graft

import graft.queries.MiningOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 mining/audit operators: semantic invariants the DuckDB
  * hash-gate can't express (partition-of-corpus checks, a-priori
  * bounds, BFS level consistency, IVM merge = recompute), plus the
  * plan-shape audits for the new join forms. */
class MiningOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("mining-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def orders: DataFrame = spark.read.parquet(s"$dir/orders.parquet")

  test("q139: buckets partition the orders, edges bracket every row") {
    val h = MiningOps.q139Histogram(spark, dir).collect()
    val n = orders.count()
    assert(h.map(_.getAs[Long]("n")).sum === n, "histogram must partition the relation")
    assert(h.forall { r =>
      val b = r.getAs[Long]("bucket")
      b >= 0 && b < MiningOps.HistBuckets
    })
    // every order's value falls inside its bucket's [lo, hi) edge pair
    val viol = h.map { r =>
      val (lo, hi) = (r.getAs[Long]("edge_lo"), r.getAs[Long]("edge_hi"))
      val pr = r.getAs[String]("o_orderpriority")
      orders.filter(col("o_orderpriority") === pr &&
        col("o_totalprice") >= lo && col("o_totalprice") < hi).count() -> r.getAs[Long]("n")
    }
    viol.foreach { case (got, want) => assert(got === want) }
  }

  test("q140: winsorized mean sits inside [p05, p95] and moves toward the center") {
    val rows = MiningOps.q140Winsorize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val mw = r.getAs[Double]("mean_wins")
      assert(p05 <= mw && mw <= p95,
        s"winsorized mean must lie within the clip bounds: $r")
    }
  }

  test("q141: a-priori bounds hold — support ≤ min item count, lift/conf exact") {
    val rows = MiningOps.q141Itemsets(spark, dir).collect()
    rows.foreach { r =>
      val sup = r.getAs[Long]("support")
      assert(sup >= MiningOps.MinSupport)
      val (c12, c21) = (r.getAs[Double]("conf_1to2"), r.getAs[Double]("conf_2to1"))
      assert(c12 > 0 && c12 <= 1.0 && c21 > 0 && c21 <= 1.0,
        "confidence = support/item-count must be a proper ratio (downward closure)")
    }
  }

  test("q142: melt emits exactly 4 metric rows per nation, values = the wide cells") {
    val long = MiningOps.q142Unpivot(spark, dir)
    val perNation = long.groupBy("n_name").count().collect()
    assert(perNation.nonEmpty && perNation.forall(_.getAs[Long]("count") === 4L))
    // spot-check one metric against its direct aggregate
    val custN = long.filter(col("metric") === "cust_n")
      .agg(sum(col("value"))).head().getDouble(0)
    val direct = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(custN === direct.toDouble, "melted cust_n must sum to the customer count")
  }

  test("q143: NOT IN goes dark on a nullable subquery; NOT EXISTS doesn't") {
    val r = MiningOps.q143NotinNulls(spark, dir).head()
    val (ni, nin, ne) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nin === 0L,
      "NOT IN over a null-bearing subquery is UNKNOWN for every row — zero matches")
    assert(ni === ne && ni > 0L,
      "null-free NOT IN and NOT EXISTS must agree (and match something)")
    val plan = MiningOps.q143NotinNulls(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("q144: tolerance only ever REMOVES q18 matches, never adds or changes") {
    val tol = MiningOps.q144AsofTolerance(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("purchase_us")))
      .toMap
    val base = graft.queries.Queries.q18AsofJoin(spark, dir).collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("purchase_us")),
        Option(r.getAs[java.lang.Long]("gap_us"))))
    assert(base.nonEmpty && tol.size === base.length)
    base.foreach { case (id, pus, gap) =>
      val expected =
        if (gap.exists(_ <= MiningOps.AsofToleranceUs)) pus else None
      assert(tol(id) === expected.map(Long2long).map(long2Long),
        s"event $id: tolerance must null out stale matches only")
    }
  }

  test("q145: the delta-merge state equals a direct full recompute") {
    val ivm = MiningOps.q145IvmView(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = {
      val dims = spark.read.parquet(s"$dir/customer.parquet")
        .join(spark.read.parquet(s"$dir/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
      orders.join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
        .orderBy("n_name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    }
    assert(ivm.toSeq === full.toSeq)
  }

  test("q146: BFS levels are consistent — every node at d>0 has a neighbor at d-1") {
    val vis = MiningOps.q146BfsPaths(spark, dir)
    val rows = vis.collect()
    assert(rows.exists(_.getAs[Long]("dist") === 0L), "the seed settles at 0")
    assert(rows.forall(r => r.getAs[Long]("dist") <= MiningOps.BfsMaxDepth))
    val dist = rows.map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    val edges = graft.queries.RelOps.cooccurEdges(spark, dir).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
    rows.filter(_.getAs[Long]("dist") > 0).foreach { r =>
      val (n, d) = (r.getAs[Long]("node"), r.getAs[Long]("dist"))
      assert(edges.exists { case (a, b) => a == n && dist.get(b).contains(d - 1) },
        s"node $n at dist $d needs a predecessor at ${d - 1}")
    }
    // no settled node could have been reached earlier than recorded
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("node"), r.getAs[Long]("dist"))
      if (d > 0) {
        val minNb = edges.collect { case (a, b) if a == n => dist.get(b) }
          .flatten.minOption
        assert(minNb.exists(_ >= d - 1), s"node $n at $d has a neighbor closer than ${d - 1}")
      }
    }
  }

  test("q148: systematic PPS — every heavy doc is certain, sample size tracks K") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val total = d.agg(sum(col("n_chars"))).head().getLong(0)
    val stride = math.max(1L, total / MiningOps.PpsTarget)
    val sample = MiningOps.q148PpsSample(spark, dir).collect()
    // systematic rule: one selection per stride multiple covered
    assert(math.abs(sample.length - total / stride) <= 1,
      s"sample size ${sample.length} vs ${total / stride} expected")
    // PPS certainty: any doc heavier than the stride MUST be sampled
    val heavy = d.filter(col("n_chars") > stride).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val picked = sample.map(_.getAs[Long]("doc_id")).toSet
    assert(heavy.subsetOf(picked), "docs heavier than the stride are certain picks")
    // determinism: a re-run yields the identical sample
    val again = MiningOps.q148PpsSample(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again === picked)
  }

  test("q149: the profiler's hot keys really are the heaviest; ratios are proper") {
    val rows = MiningOps.q149SkewReport(spark, dir).collect()
    assert(rows.length === MiningOps.SkewTopK)
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "ranked by count descending")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val trueMax = li.groupBy("l_orderkey").count()
      .agg(max("count")).head().getLong(0)
    assert(counts.head === trueMax, "rank 1 is the true heaviest key")
    rows.foreach { r =>
      assert(r.getAs[Double]("skew_ratio") >= 1.0)
      assert(r.getAs[Double]("share") > 0 && r.getAs[Double]("share") < 1)
    }
  }

  test("q149: p99 interpolation survives the all-unique-multiplicity degenerate") {
    // round-11 ADVICE: when every key count is distinct the ff frame
    // equals key cardinality — the log2-bucket discipline must still
    // localize the interpolation to the straddling buckets and agree
    // with percentile_cont. Key k gets exactly k rows → counts {1..n}.
    val n = 40
    val kv = for { k <- 1 to n; j <- 1 to k } yield (k.toLong, j.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("q149x").toString
    spark.createDataFrame(kv).toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = MiningOps.q149SkewReport(spark, tmp).collect()
    assert(out.length === math.min(MiningOps.SkewTopK, n))
    val pos = 0.99 * (n - 1)
    val expect = (math.floor(pos) + 1) + (pos - math.floor(pos))
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("p99_cnt") - expect) < 1e-9,
        s"p99 over the {1..$n} multiset must interpolate to $expect")
    }
    assert(out.head.getAs[Long]("cnt") === n.toLong)
  }

  test("q150: equi-depth bands hold near-equal counts and tile the value range") {
    val rows = MiningOps.q150EquidepthHist(spark, dir).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { case (_, bands) =>
      val ns = bands.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"equi-depth: band sizes differ by ≤1, got ${ns.toSeq}")
      val sorted = bands.sortBy(_.getAs[Int]("decile"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
          "bands must not overlap (ties split deterministically by id)")
      }
    }
  }

  test("q150: no ntile window over raw event rows (bucketed-rank discipline)") {
    val plan = MiningOps.q150EquidepthHist(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"),
      s"q150 must ride the bucketed-rank discipline — an ntile window " +
        s"hash-routes a type's whole row set to one reducer:\n$plan")
  }

  test("q150: bucketed deciles equal the ntile window on extreme doubles (null/±huge/ties)") {
    import org.apache.spark.sql.expressions.Window
    import java.sql.Timestamp
    // domain note: the op's band_sum rides dec(value, 28, 6), so
    // |value| must stay below 1e22 (ANSI decimal) — NaN/±Inf/1e308
    // are outside q150's contract in the ORIGINAL formulation too
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      null, null,
      -0.0, 0.0, -1e21, 1e21, -2.5, -2.5, -2.5, 0.01, -0.01, 7.0, 7.0,
      1e-300, -1e-300, 42.0, 1023.5, 1024.0, -511.9) ++
      (0 until 40).map(i => java.lang.Double.valueOf((i % 7) * 3.25 - 10))
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2026-01-01 00:00:00"), i.toLong % 3,
        if (i % 2 == 0) "click" else "view", v, "{}")
    } ++
      // the round-11 ADVICE degenerate: a type whose values are ALL
      // EQUAL lands its entire row set in ONE bucket straddling every
      // decile cut — the value-group arithmetic must still split it
      // into exact ntile bands (one value group, ten integer splits)
      (0 until 37).map(i => (1000L + i, Timestamp.valueOf("2026-01-01 00:00:00"),
        i.toLong % 3, "allsame", java.lang.Double.valueOf(5.0), "{}"))
    val df = spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("q150x").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = MiningOps.q150EquidepthHist(spark, tmp).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.get(3), r.get(4), r.getDouble(5))).toMap
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val want = df.withColumn("decile", ntile(MiningOps.DepthBands).over(w))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("band_sum"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.get(3), r.get(4), r.getDouble(5))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (n, lo, hi, bs)) =>
      val (wn, wlo, whi, wbs) = want(k)
      assert(n === wn, s"$k count")
      assert(lo == wlo && hi == whi, s"$k bounds: got ($lo,$hi) want ($wlo,$whi)")
      assert(bs == wbs || math.abs(bs - wbs) < 1e-6, s"$k band_sum")
    }
  }

  test("q151: tombstoned users vanish; survivors carry their true change counts") {
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val out = MiningOps.q151CdcApply(spark, dir).collect()
    val lastOps = e.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tombstoned = lastOps.collect { case (u, "error") => u }.toSet
    val surviving = out.map(_.getAs[Long]("user_id")).toSet
    assert(tombstoned.intersect(surviving).isEmpty, "deleted keys must not appear")
    assert(surviving === lastOps.keySet -- tombstoned)
    assert(out.forall(_.getAs[String]("last_op") != "error"))
  }

  test("q152: the clean fixture audits clean; stats are internally consistent") {
    val rows = MiningOps.q152EmbedAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_zero") === 0L && r.getAs[Long]("n_nan") === 0L &&
        r.getAs[Long]("n_baddim") === 0L, s"driver fixture must audit clean: $r")
      val (mn, mx, mean) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("max_norm"), r.getAs[Double]("mean_norm"))
      assert(mn > 0 && mn <= mean && mean <= mx)
    }
  }

  test("q153: profile agrees with q116's counts; coefficient is a proper ratio") {
    val p = graft.queries.RelOps.q153GraphProfile(spark, dir).head()
    val t116 = graft.queries.RelOps.q116Triangles(spark, dir).head()
    assert(p.getAs[Long]("n_nodes") === t116.getAs[Long]("n_nodes"))
    assert(p.getAs[Long]("n_edges") === t116.getAs[Long]("n_edges"))
    assert(p.getAs[Long]("n_triangles") === t116.getAs[Long]("n_triangles"))
    val cc = p.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0)
    assert(p.getAs[Long]("n_wedges") >= 3 * p.getAs[Long]("n_triangles"),
      "every triangle closes exactly 3 wedges")
  }

  test("q154: credit conserves — total credit equals the attributed purchase count") {
    val out = MiningOps.q154Multitouch(spark, dir).collect()
    val totalCredit = out.map(_.getAs[Double]("credit")).sum
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), unix_micros(col("ts")).as("pus"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
    val attributed = p.join(c, col("user_id") === col("cu") &&
        col("cus") <= col("pus") &&
        col("cus") >= col("pus") - MiningOps.TouchWindowUs)
      .select("pid").distinct().count()
    // each attributed purchase distributes exactly one unit (mod the
    // 1e-9 decimal pin per touch)
    assert(math.abs(totalCredit - attributed) < 1e-3,
      s"credit $totalCredit vs $attributed purchases")
  }

  test("q155: the certification holds and the sampler is deterministic") {
    val a = MiningOps.q155BottomkQuantile(spark, dir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Boolean]("within_bounds"),
        s"sample median must sit within the binomial rank bound: $r")
    }
    val b = MiningOps.q155BottomkQuantile(spark, dir).collect()
      .map(_.getAs[Double]("est_median")).toSeq
    assert(a.map(_.getAs[Double]("est_median")).toSeq === b)
  }

  test("q168: every serialization leg round-trips the fingerprint") {
    val r = MiningOps.q168FormatRoundtrip(spark, dir).head()
    assert(r.getAs[Boolean]("csv_ok"),
      "CSV text round trip (doubles shortest-repr, ISO timestamps) must hold")
    assert(r.getAs[Boolean]("json_ok") && r.getAs[Boolean]("orc_ok"))
    assert(r.getAs[Long]("n") === orders.count())
  }

  test("q169: pre-schema rows surface NULL (made explicit) under mergeSchema") {
    val rows = MiningOps.q169MergeSchema(spark, dir).collect()
    val pre = rows.filter(_.getAs[String]("prioridade") == "PRE_SCHEMA")
    assert(pre.length === 1, "the old-vintage batch groups under the explicit marker")
    assert(pre.head.getAs[Long]("n") ===
      orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(rows.map(_.getAs[Long]("n")).sum === orders.count(),
      "the merged relation must cover both vintages exactly")
  }

  test("q141/q146 plan shape: per-basket equi-joins, no cartesian anywhere") {
    val p141 = MiningOps.q141Itemsets(spark, dir).queryExecution.executedPlan.toString
    assert(!p141.contains("CartesianProduct"),
      "pair generation must equi-join on the basket key")
    // the prefix sum must ride the two-phase offset idiom: the
    // cumulative window partitions by pid (hash exchange), never the
    // global-order SinglePartition sort (the 1-row stride aggregate's
    // own SinglePartition exchange is fine — it moves one row)
    val p148 = MiningOps.q148PpsSample(spark, dir).queryExecution.executedPlan.toString
    val windowIdx = p148.indexOf("Window [sum(n_chars")
    assert(windowIdx >= 0, s"expected the running-sum window:\n$p148")
    assert(p148.substring(windowIdx).contains("], [pid"),
      s"the running sum must partition by pid (local per slice):\n$p148")
    assert(p148.contains("Exchange hashpartitioning(pid"),
      s"the window's exchange must be the pid hash, not SinglePartition:\n$p148")
    // q149's global rank window must collapse to a distributed top-k
    // BEFORE its (tiny) single-partition window: Spark's window-limit
    // pushdown plans TakeOrderedAndProject under the rank filter, so
    // only ~K rows ever cross the exchange — key cardinality never does
    val p149 = MiningOps.q149SkewReport(spark, dir).queryExecution.executedPlan.toString
    assert(p149.contains("TakeOrderedAndProject"),
      s"the hot-key rank must push down to a top-k:\n$p149")
    val p139 = MiningOps.q139Histogram(spark, dir).queryExecution.executedPlan.toString
    assert(!p139.contains("Exchange rangepartitioning") || p139.contains("Sort"),
      "histogram is one hash agg + final order")
  }
}
