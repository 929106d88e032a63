package graft

import graft.functions.FuzzyOps
import graft.queries.RelOps
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side invariants for the round-8 second-wave operators
  * (q113 bloom join, q114 gap-fill, q115 rolling peak, q116
  * triangles, q117 skyline, q118 fuzzy join, q119 HLL incremental,
  * sq13 transformWithState profile). Cross-engine value equality is
  * the DuckDB oracle's job at the sf0.01 gate; these pin semantics
  * the oracle can't see (identity of physical rewrites at another SF,
  * brute-force ground truth, plan shape, streaming/batch
  * equivalence). */
class RelOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("relops-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ------------------------------------------------------- jaro-winkler

  test("jaroWinkler matches the published algorithm's pinned values") {
    def jw(a: String, b: String): Double =
      FuzzyOps.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
    // values pinned against DuckDB jaro_winkler_similarity (the q118
    // oracle engine) — including the 0.7 boost-threshold gate and the
    // both-empty → 0 convention
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    // jaro = 2/3 ≤ 0.7: the 3-char shared prefix must NOT boost
    assert(math.abs(jw("abcdef", "abcxyz") - 0.6666666666666666) < 1e-15)
    assert(math.abs(jw("ababab", "bababa") - 0.8333333333333334) < 1e-15)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
  }

  // --------------------------------------------------------------- q113

  test("q113: bloom-filtered join is identical to the plain join") {
    // identity at a SF the oracle gate doesn't run: the bloom is a
    // physical rewrite, false positives die in the exact join
    val got = RelOps.q113BloomJoin(spark, dir).collect()
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("l_returnflag").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("q113 plan: the bloom probe filters the lineitem side pre-join") {
    val plan = RelOps.q113BloomJoin(spark, dir).queryExecution.executedPlan.toString
    // the only xxhash64 in this query is the bloom membership probe;
    // it must appear (as a Filter over the probe scan), proving the
    // reduction runs before the join rather than being optimized away
    assert(plan.contains("xxhash64"), s"bloom probe missing from plan:\n$plan")
  }

  // ---------------------------------------------------------- plan shapes

  test("plan shapes: pruned scans and broadcast tiny sides") {
    // q124: the events scan must prune to exactly the two used columns
    // — a JSON profile that drags user_id/value/ts along reads the
    // whole table at 100 TB
    val q124Scans = RelOps.q124JsonExtract(spark, dir)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
    val evScan = q124Scans.find(_.contains("events.parquet")).getOrElse("")
    val rs = evScan.replaceAll("(?s).*ReadSchema: ", "").linesIterator.next()
    assert(rs.contains("event_type") && rs.contains("props") &&
      !rs.contains("user_id") && !rs.contains("value"),
      s"q124 must scan only (event_type, props): $rs")
    // q117: the frontier joins back BROADCAST (it is frontier-sized)
    val q117Plan = RelOps.q117Skyline(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q117Plan.contains("BroadcastHashJoin") ||
      q117Plan.contains("BroadcastNestedLoopJoin"),
      s"q117's frontier join-back must broadcast:\n$q117Plan")
    // q118: the name-pair scores join back to probe rows broadcast
    val q118Plan = RelOps.q118FuzzyJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q118Plan.contains("BroadcastHashJoin"),
      s"q118's score join-back must broadcast:\n$q118Plan")
  }

  // --------------------------------------------------------------- q114

  test("q114: gap days are unobserved and carry the latest prior day's sum") {
    val events = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        col("value").cast("decimal(18,2)").as("v"))
    val obs = events.groupBy("user_id", "day")
      .agg(sum("v").cast("double").as("dv"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime) -> r.getDouble(2)).toMap
    val gaps = RelOps.q114GapfillLocf(spark, dir).collect()
    assert(gaps.nonEmpty, "sf0.001 events must contain at least one per-user gap day")
    val dayMs = 86400000L
    gaps.foreach { r =>
      val (u, d, fv) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(!obs.contains((u, d)), "an emitted gap day must be unobserved")
      // latest observed day before the gap carries forward
      val prior = obs.keys.filter(k => k._1 == u && k._2 < d)
      assert(prior.nonEmpty, "a gap day always has an observed prior day")
      val lastDay = prior.map(_._2).max
      assert(fv == obs((u, lastDay)), "LOCF must carry the latest prior day's sum")
      assert((d - lastDay) % dayMs == 0 && d - lastDay >= dayMs)
    }
  }

  // --------------------------------------------------------------- q115

  test("q115: peak equals the brute-force trailing-24h maximum") {
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    val got = RelOps.q115RollingPeak(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val uss = rows.map(_._3).sorted
      val peak = uss.map(t => uss.count(x => x >= t - RelOps.RollingHorizonUs && x <= t)).max
      assert(got(u) == peak, s"user $u: peak_n24 ${got(u)} != brute-force $peak")
    }
  }

  // --------------------------------------------------------------- q116

  test("q116: triangle count equals brute force on the co-occurrence graph") {
    // sf0.01: the repeated-co-occurrence graph at sf0.001 has 2 edges
    // and no triangle — the brute-force equality needs a real graph
    val dir = "/root/testdata/sf0.01"
    val g = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type").as("et"),
        expr(s"unix_micros(ts) div ${RelOps.TriBucketUs}").as("b"),
        col("user_id").as("u"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val weights = scala.collection.mutable.Map.empty[(Long, Long), Int]
    g.groupBy(c => (c._1, c._2)).values.foreach { cell =>
      val us = cell.map(_._3).distinct.sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        weights((us(i), us(j))) = weights.getOrElse((us(i), us(j)), 0) + 1
    }
    val edges = weights.filter(_._2 >= RelOps.TriMinCoocc).keySet.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nTri = edges.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty[Long]).count(c => c > b && edges.contains((b, c)))
    }.sum
    val row = RelOps.q116Triangles(spark, dir).collect().head
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == nTri,
      s"degree-ordered count ${row.getAs[Long]("n_triangles")} != brute-force $nTri")
  }

  // --------------------------------------------------------------- q193

  test("q193: neighborhood Jaccard equals brute force over the co-occurrence graph") {
    // sf0.01 for the same reason as q116: the sf0.001 graph is 2 edges
    val dir = "/root/testdata/sf0.01"
    val edges = graft.queries.RelOps.cooccurEdges(spark, dir).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val nbrs = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = nbrs.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      (u, v) = (nodes(i), nodes(j))
      common = (nbrs(u) & nbrs(v)).size if common > 0
    } yield (u, v, common.toLong, nbrs(u).size.toLong, nbrs(v).size.toLong,
        r6(common.toDouble / (nbrs(u).size + nbrs(v).size - common))))
      .sortBy { case (u, v, _, _, _, j) => (-j, u, v) }
      .take(RelOps.JacTop)
    val got = RelOps.q193NeighborJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("common"), r.getAs[Long]("du"), r.getAs[Long]("dv"),
        r.getAs[Double]("jaccard")))
    assert(got.toSeq == want.toSeq,
      s"wedge-join Jaccard must equal the brute-force neighbor-set scan " +
        s"(got ${got.length} rows, want ${want.length})")
  }

  test("q193 plan: the shortlist is a rank-pushed top-k, candidates exist only through shared neighbors") {
    val dir = "/root/testdata/sf0.01"
    val plan = RelOps.q193NeighborJaccard(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") ||
        plan.contains("WindowGroupLimit"),
      s"q193's top-${RelOps.JacTop} shortlist must be rank-pushed, got:\n$plan")
    // the |V|² zero-overlap pairs must never materialize: no cartesian
    // / broadcast nested loop anywhere in the wedge pipeline
    assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
      s"q193 must generate candidates only through the neighbor-key join, got:\n$plan")
  }

  // --------------------------------------------------------------- q201

  test("q201: assortativity equals the brute-force Pearson over directed links") {
    val dir = "/root/testdata/sf0.01"
    val edges = graft.queries.RelOps.cooccurEdges(spark, dir).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val adj = edges ++ edges.map(e => (e._2, e._1))
    val deg = adj.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val links = adj.map { case (a, b) => (deg(a), deg(b)) }
    val n = links.length.toLong
    val (sx, sy) = (links.map(_._1).sum, links.map(_._2).sum)
    val sxy = links.map(l => l._1 * l._2).sum
    val (sxx, syy) = (links.map(l => l._1 * l._1).sum,
      links.map(l => l._2 * l._2).sum)
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val want =
      if (vx == 0 || vy == 0) None
      else Some(BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt(vx.toDouble * vy.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val r = RelOps.q201Assortativity(spark, dir).head()
    assert(r.getAs[Long]("n_links") == n)
    val gotR = Option(r.getAs[java.lang.Double]("assortativity"))
      .map(_.doubleValue)
    assert(gotR == want, s"assortativity $gotR != brute force $want")
    // the co-occurrence graph has non-trivial degree structure: the
    // correlation must be defined and within Pearson bounds
    assert(want.isDefined && want.get >= -1.0 && want.get <= 1.0)
  }

  // --------------------------------------------------------------- q209

  test("q209: retention matrix equals a brute-force cohort recompute") {
    import java.time.{DayOfWeek, ZoneOffset}
    import java.time.temporal.{ChronoUnit, TemporalAdjusters}
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts").cast("timestamp"))
      .collect()
      .map { r =>
        val wk = r.getTimestamp(1).toInstant.atZone(ZoneOffset.UTC)
          .toLocalDate
          .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        (r.getLong(0), wk)
      }.distinct
    val cohort = ev.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val want = ev.map { case (u, w) =>
      (cohort(u), ChronoUnit.DAYS.between(cohort(u), w) / 7)
    }.groupBy(identity).map { case ((cw, off), rows) =>
      (cw, off, sizes(cw), rows.length.toLong,
        r6(rows.length.toDouble / sizes(cw)))
    }.toSeq.sortBy(t => (t._1.toEpochDay, t._2))
    val got = RelOps.q209CohortRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getAs[Long]("week_offset"),
        r.getAs[Long]("cohort_size"), r.getAs[Long]("n_active"),
        r.getAs[Double]("retention")))
    assert(got.toSeq == want)
    // week-0 retention is 1 by construction for every cohort
    assert(got.filter(_._2 == 0L).forall(_._5 == 1.0))
  }

  // --------------------------------------------------------------- q210

  test("q210: funnel counts equal a brute-force strict-order walk") {
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("ts").cast("timestamp"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toInstant))
    val byUser = ev.groupBy(_._1)
    def step(prev: Map[Long, java.time.Instant], etype: String) =
      prev.flatMap { case (u, anchor) =>
        byUser(u).filter(e => e._2 == etype && e._3.isAfter(anchor))
          .map(_._3).minOption.map(u -> _)
      }
    val s1 = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == RelOps.FunnelSteps.head).map(_._3).minOption
        .map(u -> _)
    }
    val s2 = step(s1, RelOps.FunnelSteps(1))
    val s3 = step(s2, RelOps.FunnelSteps(2))
    val r = RelOps.q210FunnelSteps(spark, dir).head()
    assert(r.getAs[Long]("n_users") == byUser.size)
    assert(r.getAs[Long]("n_step1") == s1.size)
    assert(r.getAs[Long]("n_step2") == s2.size)
    assert(r.getAs[Long]("n_step3") == s3.size)
    assert(r.getAs[Double]("conv_12") == r6(s2.size.toDouble / s1.size))
    assert(r.getAs[Double]("conv_23") == r6(s3.size.toDouble / s2.size))
    assert(r.getAs[Double]("conv_overall") == r6(s3.size.toDouble / s1.size))
    // a funnel is monotone
    assert(s1.size >= s2.size && s2.size >= s3.size && s3.size > 0)
  }

  // --------------------------------------------------------------- q211

  test("q211: gap statistics equal a brute-force per-user timeline walk") {
    val dir = "/root/testdata/sf0.01"
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, es) =>
      val ts = es.map(_._3).sorted
      ts.zip(ts.drop(1)).map { case (a, b) => (es.head._2, b - a) }
    }
    val want = gaps.groupBy(_._1).map { case (t, gs) =>
      val v = gs.map(_._2).sorted
      val n = v.length
      val mids = Seq((n + 1) / 2, (n + 2) / 2).distinct.map(i => v(i - 1))
      (t, n.toLong,
        r6(v.map(BigInt(_)).sum.toDouble / n / 1000000.0),
        r6(mids.map(BigInt(_)).sum.toDouble / mids.length / 1000000.0),
        r6(v.max.toDouble / 1000000.0))
    }.toSeq.sortBy(_._1)
    val got = RelOps.q211EventGaps(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("mean_gap_s"), r.getAs[Double]("median_gap_s"),
        r.getAs[Double]("max_gap_s")))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._3 > 0 && g._4 > 0 && g._5 >= g._4))
  }

  test("q211 plan: no window partitions by bare event_type over raw gap rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = RelOps.q211EventGaps(spark, dir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    // the round-10 scale-killer shape was row_number() OVER (PARTITION
    // BY event_type ...) over RAW gap rows — a near-full per-type sort
    // on a handful of reducers at 100 TB. Per-type windows are only
    // legal over the collapsed (type, bucket) count frame, i.e. with
    // an Aggregate strictly beneath them.
    wins.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      if (parts == Seq("event_type")) {
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"per-type window runs over raw (un-aggregated) rows:\n$w")
      }
    }
  }

  // --------------------------------------------------------------- q117

  test("q117: output is exactly the non-dominated set") {
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(x: (Long, Double, Int)) = parts.exists(b =>
      b._2 <= x._2 && b._3 >= x._3 && (b._2 < x._2 || b._3 > x._3))
    val got = RelOps.q117Skyline(spark, dir).select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val want = parts.filter(p => !dominated(p)).map(_._1).toSet
    assert(got == want)
  }

  // --------------------------------------------------------------- q118

  test("q118: every match is the block-local argmax above threshold") {
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def jw(a: String, b: String): Double =
      math.rint(FuzzyOps.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b)) * 1e6) / 1e6
    val got = RelOps.q118FuzzyJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (probe, matched, sim) =>
      val dirty = parts.find(_._1 == probe).get._2.filterNot("aeiou".contains(_))
      val block = parts.filter(p => p._2.take(1) == dirty.take(1))
      val scored = block.map(p => (jw(dirty, p._2), p._1))
        .filter(_._1 >= RelOps.FuzzyMinSim)
      val best = scored.minBy { case (s, k) => (-s, k) }
      assert(sim == best._1 && matched == best._2,
        s"probe $probe: got ($matched, $sim) want ${best.swap}")
    }
  }

  // --------------------------------------------------------------- q119

  test("q119: bounds pinned true; exact cumulative distinct is monotone") {
    val rows = RelOps.q119HllIncremental(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_bounds")),
      "HLL estimate must stay within 5% of exact at every day")
    val ns = rows.map(_.getAs[Long]("n_exact"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b },
      "cumulative distinct users can never decrease")
  }

  // --------------------------------------------------------------- q120

  test("q120: SCD2 intervals partition each user's timeline") {
    val rows = RelOps.q120Scd2(spark, dir).collect()
    val events = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        expr("min(unix_micros(ts)) div 1000").as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(r => (r.getAs[Long]("valid_from_ms"),
        r.getAs[String]("event_type")))
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // half-open chain: each interval's end is the next one's start
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_ms") == b.getAs[Long]("valid_from_ms"))
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type") ||
            a.getAs[Long]("valid_to_ms") > a.getAs[Long]("valid_from_ms"),
            "adjacent same-type runs must have merged unless tied-ms split them")
        case _ =>
      }
      // intervals account for every event, starting at the first one
      assert(sorted.map(_.getAs[Long]("n_in_state")).sum == events(u)._1)
      assert(sorted.head.getAs[Long]("valid_from_ms") == events(u)._2)
    }
  }

  // --------------------------------------------------------------- q121

  test("q121: fingerprint is partition-order independent and content-sensitive") {
    def fp(df: org.apache.spark.sql.DataFrame): String = {
      df.select(concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal").cast("decimal(18,2)"), col("c_mktsegment")).as("r"))
        .select(conv(substring(md5(col("r")), 1, 15), 16, 10).cast("long").as("h"))
        .agg(sum(col("h").cast("decimal(38,0)")).cast("string")).collect()(0).getString(0)
    }
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val viaQuery = RelOps.q121TableChecksum(spark, dir)
      .filter(col("tbl") === "customer").collect()(0).getAs[String]("checksum")
    // sum is commutative: any repartitioning yields the identical sum
    assert(fp(cust.repartition(13)) == viaQuery)
    assert(fp(cust.repartition(1)) == viaQuery)
    // one-row perturbation must change it
    val tampered = cust.withColumn("c_acctbal",
      when(col("c_custkey") === 7, col("c_acctbal") + 0.01).otherwise(col("c_acctbal")))
    assert(fp(tampered) != viaQuery)
  }

  // --------------------------------------------------------------- q122

  test("q122: Welch z matches a double-precision recompute") {
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(18,2)").cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val rows = RelOps.q122AbTest(spark, dir).collect()
    rows.foreach { r =>
      val et = r.getString(0)
      val a = evs.filter(e => e._1 == et && e._2 % 2 == 0).map(_._3)
      val b = evs.filter(e => e._1 == et && e._2 % 2 == 1).map(_._3)
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
      def stats(x: Array[Double]) = {
        val n = x.length; val m = x.sum / n
        (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
      }
      val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
      val z = (ma - mb) / math.sqrt(va / na + vb / nb)
      // the engine derives z from exact decimal sums; a naive two-pass
      // double recompute agrees to well under the 6-dp rounding
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-6,
        s"$et: ${r.getAs[Double]("z")} vs $z")
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(r.getAs[Double]("z")) >= RelOps.AbZCrit))
    }
  }

  // --------------------------------------------------------------- q123

  test("q123: peak concurrency equals the brute-force sweep") {
    val gap = graft.queries.Queries.SessionGapUs
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val us = rows.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var s0 = us.head; var last = us.head
      us.tail.foreach { t =>
        if (t - last > gap) { out += ((s0, last)); s0 = t }
        last = t
      }
      out += ((s0, last)); out
    }.toSeq
    val points = sessions.flatMap(s => Seq((s._1, 1), (s._2 + 1, -1)))
      .sortBy(p => (p._1, -p._2))
    var run = 0; var peak = 0
    points.foreach { p => run += p._2; peak = math.max(peak, run) }
    val row = RelOps.q123IntervalPeak(spark, dir).collect().head
    assert(row.getAs[Long]("n_sessions") == sessions.size)
    assert(row.getAs[Long]("peak_concurrency") == peak)
  }

  // --------------------------------------------------------------- q124

  test("q124: typed JSON extraction counts malformed/missing as NULL, not drops") {
    val rows = RelOps.q124JsonExtract(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val rawN = spark.read.parquet(s"$dir/events.parquet").count()
    assert(totalN == rawN, "every event is profiled — parse failures must not drop rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_k") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("distinct_k") <= r.getAs[Long]("n_with_k"))
      if (r.getAs[Long]("n_with_k") > 0)
        assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
    }
  }

  // --------------------------------------------------------------- q127

  test("q127: KS statistic equals the brute-force CDF sweep") {
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type"), col("value"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val rows = RelOps.q127KsDrift(spark, dir).collect()
    rows.foreach { r =>
      val et = r.getString(0)
      val a = evs.filter(e => e._1 == et && e._3 % 2 == 0).map(_._2).sorted
      val b = evs.filter(e => e._1 == et && e._3 % 2 == 1).map(_._2).sorted
      val xs = (a ++ b).distinct.sorted
      val d = xs.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.length -
          b.count(_ <= x).toDouble / b.length)
      }.max
      assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-6,
        s"$et: ${r.getAs[Double]("ks_d")} vs brute $d")
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    }
  }

  // --------------------------------------------------------------- q128

  test("q128: MI is non-negative, bounded by min marginal entropy") {
    val r = RelOps.q128MutualInfo(spark, dir).collect().head
    val (mi, nmi) = (r.getAs[Double]("mi"), r.getAs[Double]("nmi"))
    assert(mi >= -1e-6, "MI can never be negative")
    assert(nmi >= -1e-6 && nmi <= 1 + 1e-6, "NMI lives in [0,1]")
    // brute-force recompute in plain doubles
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type"), hour(col("ts")))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val n = evs.length.toDouble
    val cxy = evs.groupBy(identity).view.mapValues(_.length).toMap
    val cx = evs.groupBy(_._1).view.mapValues(_.length).toMap
    val cy = evs.groupBy(_._2).view.mapValues(_.length).toMap
    val brute = cxy.map { case ((x, y), c) =>
      c / n * math.log(c / n / (cx(x) / n) / (cy(y) / n))
    }.sum
    assert(math.abs(mi - brute) < 1e-5, s"MI $mi vs brute $brute")
  }

  // --------------------------------------------------------------- q129

  test("q129: slope equals the brute-force least-squares fit") {
    val daily = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val rows = RelOps.q129UserTrend(spark, dir).collect()
    val byUser = daily.groupBy(_._1)
    rows.foreach { r =>
      val obs = byUser(r.getLong(0))
      val d0 = obs.map(_._2).min
      val xs = obs.map(o => ((o._2 - d0) / 86400000L).toDouble)
      val ys = obs.map(_._3.toDouble)
      val n = xs.length
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6,
        s"user ${r.getLong(0)}: ${r.getAs[Double]("slope")} vs $slope")
      assert(r.getAs[Boolean]("declining") == (r.getAs[Double]("slope") < 0))
    }
  }

  // --------------------------------------------------------------- q130

  test("q130: changepoint is the argmax of the exact cusum") {
    val hourly = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val rows = RelOps.q130Changepoint(spark, dir).collect()
    val byUser = hourly.groupBy(_._1)
    rows.foreach { r =>
      val obs = byUser(r.getLong(0)).sortBy(_._2)
      val n = obs.length
      val s = obs.map(_._3).sum
      var prefix = 0L
      val cands = obs.zipWithIndex.dropRight(1).map { case ((_, h, c), i) =>
        prefix += c
        (h, (n * prefix - (i + 1) * s).abs)
      }
      val best = cands.maxBy(c => (c._2, -c._1))
      assert(r.getAs[Long]("cp_hour_ms") == best._1,
        s"user ${r.getLong(0)}: cp ${r.getAs[Long]("cp_hour_ms")} != ${best._1}")
      assert(math.abs(r.getAs[Double]("strength") -
        best._2.toDouble / (n.toDouble * s)) < 1e-6)
    }
  }

  // --------------------------------------------------------------- q131

  test("q131: cascaded rollups equal direct-from-raw aggregation") {
    val got = RelOps.q131RollupCascade(spark, dir).collect().map(_.toSeq)
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    def direct(grain: String) = e
      .groupBy(date_trunc(grain, col("ts")).as("period"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"),
        min("value").as("min_v"), max("value").as("max_v"))
      .select(lit(grain).as("grain"), unix_millis(col("period")).as("period_ms"),
        col("n_events"), col("n_days"), col("v"), col("min_v"), col("max_v"))
    val want = direct("week").unionAll(direct("month"))
      .orderBy("grain", "period_ms").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      "re-aggregating the daily MV must equal aggregating raw events")
  }

  // --------------------------------------------------------------- q132

  test("q132: PIT states match a brute-force as-of lookup") {
    val e = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // state-change points per user: first event of each same-type run,
    // collapsed to max(state) per tied instant (the pinned rule)
    val changes = e.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var prev: String = null
      sorted.foreach { r =>
        if (r._3 != prev) { runs += ((r._4, r._3)); prev = r._3 }
      }
      runs.groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq.sortBy(_._1)
    }.toMap
    val brute = e.map { r =>
      val cs = changes(r._1).filter(_._1 <= r._4 - RelOps.PitLagUs)
      val st = if (cs.isEmpty) "none" else cs.last._2
      (st, r._3)
    }.groupBy(identity).view.mapValues(_.length).toMap
    val got = RelOps.q132PitJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == brute.map { case (k, v) => k -> v.toLong },
      s"PIT histogram mismatch: $got vs $brute")
  }

  // --------------------------------------------------------------- q133

  test("q133: recursive closure equals a literal parent walk") {
    val dir = "/root/testdata/sf0.01" // sf0.001's graph is 2 edges
    val g = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${RelOps.TriBucketUs}").as("b"), col("user_id"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val weights = scala.collection.mutable.Map.empty[(Long, Long), Int]
    g.groupBy(c => (c._1, c._2)).values.foreach { cell =>
      val us = cell.map(_._3).distinct.sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        weights((us(i), us(j))) = weights.getOrElse((us(i), us(j)), 0) + 1
    }
    val edges = weights.filter(_._2 >= RelOps.TriMinCoocc).keySet
    val parent = edges.groupBy(_._2).map { case (y, es) => y -> es.map(_._1).min }
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val want = nodes.map { u =>
      var (anc, d) = (u, 0L)
      while (parent.contains(anc) && d < RelOps.HierMaxDepth) {
        anc = parent(anc); d += 1
      }
      u -> (anc, d)
    }.toMap
    val got = RelOps.q133Hierarchy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    assert(got.values.exists(_._2 >= 2), "the forest must have real depth to test")
  }

  // --------------------------------------------------------------- q134

  test("q134: lateral top-k equals the window-rank formulation") {
    val got = RelOps.q134LateralTopk(spark, dir).collect().map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  // --------------------------------------------------------------- q135

  test("q135: profile statistics match per-column recomputes") {
    val rows = RelOps.q135Profile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val n = o.count()
    assert(rows.size == 6 && rows.values.forall(_.getAs[Long]("n") == n))
    val kd = o.select(countDistinct("o_orderkey")).head().getLong(0)
    assert(rows("o_orderkey").getAs[Long]("n_distinct") == kd)
    assert(rows("o_orderkey").getAs[Long]("n_null") == 0)
    val ps = o.select(countDistinct("o_orderpriority")).head().getLong(0)
    assert(rows("o_orderpriority").getAs[Long]("n_distinct") == ps)
    assert(rows("o_orderstatus").getAs[String]("min_v") <=
      rows("o_orderstatus").getAs[String]("max_v"))
    // the sketch certification boolean ships true at gate scale
    assert(rows.values.forall(_.getAs[Boolean]("within_bounds")))
  }

  test("q135: sketch-vs-exact bound holds at sf0.01 and sf0.1; " +
    "the sf0.1 plan carries no exact distinct") {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val df = RelOps.q135Profile(spark, sf)
      val rows = df.collect().map(r => r.getString(0) -> r).toMap
      assert(rows.size == 6 && rows.values.forall(_.getAs[Boolean]("within_bounds")),
        s"within_bounds violated at $sf")
      // the spec-side exact twin: shipped n_distinct (exact at the
      // gate, HLL++ estimate above it) within ProfileBound of the
      // recomputed exact distinct, every column, both SFs
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val exact = Map(
        "o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
        "o_orderstatus" -> "o_orderstatus", "o_orderpriority" -> "o_orderpriority")
      exact.foreach { case (name, c) =>
        val e = o.select(countDistinct(col(c))).head().getLong(0)
        val got = rows(name).getAs[Long]("n_distinct")
        assert(math.abs(got - e).toDouble <=
          math.max(1.0, RelOps.ProfileBound * e),
          s"$name at $sf: shipped $got vs exact $e")
      }
    }
    // above the gate the profiler is sketch-only: no exact-distinct
    // Expand rewrite, no per-value shuffle in the plan
    val plan = RelOps.q135Profile(spark, "/root/testdata/sf0.1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "sf0.1 profile plan still expands for exact distinct")
    assert(!plan.toLowerCase.contains("count(distinct"),
      "sf0.1 profile plan still computes exact distinct")
  }

  // --------------------------------------------------------------- q136

  test("q136: digit histogram partitions the rows; chi2 terms recompute") {
    val rows = RelOps.q136Benford(spark, dir).collect()
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 0)
    val n = o.count()
    assert(rows.map(_.getAs[Long]("obs")).sum == n)
    assert(rows.map(_.getAs[String]("digit")).toSet == (1 to 9).map(_.toString).toSet)
    rows.foreach { r =>
      val d = r.getAs[String]("digit").toInt
      val p = RelOps.BenfordP(d - 1)
      val obs = r.getAs[Long]("obs").toDouble
      val chi = math.pow(obs - n * p, 2) / (n * p)
      assert(math.abs(r.getAs[Double]("chi2_term") - chi) < 1e-5)
    }
  }

  // --------------------------------------------------------------- q137

  test("q137: schema resolution skips dropped fields, applies defaults, keeps fidelity") {
    import graft.functions.AvroSerde
    import graft.model.SchemaDef
    val row = spark.read.parquet(graft.sources.GenFixtures.MessagesPath).limit(1)
      .select(struct(col("id"), col("timestamp"), col("sequencia"),
        col("dados"), col("versao")).as("p"))
    val dec = row
      .select(AvroSerde.from_avro_evolved(
        AvroSerde.to_avro(col("p"), SchemaDef.mensagemAvroJson),
        SchemaDef.mensagemAvroJson, graft.queries.Queries.MensagemV2Json).as("d"))
    // reader-shaped schema: versao gone, prioridade present; nested
    // Registro: uuid gone, peso present
    val dt = dec.schema("d").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dt.fieldNames.toSeq == Seq("id", "timestamp", "sequencia", "dados", "prioridade"))
    val reg = dt("dados").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(reg.fieldNames.toSeq == Seq("indice", "texto", "numero", "timestamp", "peso"))
    val r = dec.select(col("d.prioridade"), col("d.dados")(0).getField("peso"),
      col("d.id")).head()
    assert(r.getInt(0) == 7, "added top-level field must carry its declared default")
    assert(r.getDouble(1) == 1.5, "added nested field must carry its declared default")
    assert(r.getString(2) != null && r.getString(2).nonEmpty)
  }

  // --------------------------------------------------------------- sq14

  test("sq14: the files the sink wrote equal the batch aggregate") {
    val got = StreamOps.sq14ForeachBatchSink(spark, dir).collect().map(_.toSeq)
    val want = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma"))
      .orderBy("event_type").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  // --------------------------------------------------------------- q125

  test("q125: confusion matrix is a partition of the corpus") {
    val rows = graft.llmops.VectorOps.q125ConfusionMatrix(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nVecs,
      "every vector lands in exactly one (true, pred) cell")
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getAs[Int]("label")))
      assert(labels.contains(r.getAs[Int]("pred")),
        "a prediction can only be an existing label centroid")
    }
    // the space is informative: diagonal mass dominates a uniform guess
    val diag = rows.filter(r => r.getAs[Int]("label") == r.getAs[Int]("pred"))
      .map(_.getAs[Long]("n")).sum
    assert(diag.toDouble / nVecs > 1.0 / labels.size,
      "nearest-centroid must beat uniform chance on its own training labels")
  }

  // --------------------------------------------------------------- q126

  test("q126: AUC equals the brute-force pairwise probability") {
    val dir = "/root/testdata/sf0.001"
    val evs = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("value"), (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    val pos = evs.filter(_._2).map(_._1)
    val neg = evs.filterNot(_._2).map(_._1)
    // AUC = P(pos > neg) + 0.5 P(pos = neg), literally enumerated
    var num = 0.0
    pos.foreach { p => neg.foreach { n =>
      if (p > n) num += 1.0 else if (p == n) num += 0.5 } }
    val brute = num / (pos.length.toDouble * neg.length)
    val row = RelOps.q126RocAuc(spark, dir).collect().head
    assert(row.getAs[Long]("n_pos") == pos.length)
    assert(row.getAs[Long]("n_neg") == neg.length)
    assert(math.abs(row.getAs[Double]("auc") - brute) < 1e-6,
      s"rank-sum AUC ${row.getAs[Double]("auc")} != pairwise $brute")
  }

  test("q126: the below prefix runs per-pid, never as one global window") {
    // round-11 verdict #5: the cumulative over distinct-score groups
    // must ride the q123 two-phase form — the window partitions by
    // spark_partition_id of the range-partitioned group table, so no
    // SinglePartition sort of the score space survives in the plan
    val plan = RelOps.q126RocAuc(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val windowIdx = plan.indexOf("Window [")
    assert(windowIdx >= 0, s"expected the local running-sum window:\n$plan")
    assert(plan.substring(windowIdx).contains("], [pid"),
      s"the below prefix must partition by pid:\n$plan")
    // the only single-partition stages allowed are the final scalar
    // aggregates (they consume ≤ nPart partial rows) — no window may
    // sort on one reducer
    assert(!plan.contains("Window [") ||
      !plan.substring(windowIdx).takeWhile(_ != '\n').contains("], []"),
      s"no unpartitioned window may survive:\n$plan")
  }

  // --------------------------------------------------------------- sq15

  test("sq15: V2 timer sessionizer equals the GroupStateTimeout shape") {
    // two different stateful APIs (transformWithState event-time
    // timers vs flatMapGroupsWithState EventTimeTimeout), same flush
    // tick, must agree row-for-row
    val v2 = StreamOps.sq15StreamTimerSession(spark, dir).collect().map(_.toSeq)
    val v1 = StreamOps.sq7SessionizeTimeout(spark, dir).collect().map(_.toSeq)
    assert(v2.toSeq == v1.toSeq)
  }

  // --------------------------------------------------------------- sq16

  test("sq16/sq17: bounded state rows equal batch recency/pivot") {
    val ln = StreamOps.sq16StreamLastn(spark, dir).collect()
    val e = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = e.groupBy(_._1)
    ln.foreach { r =>
      val rows = byUser(r.getLong(0)).sortBy(x => (-x._3, -x._2))
      assert(r.getLong(1) == rows.length)
      val want = rows.take(StreamOps.LastN).map(_._2).padTo(StreamOps.LastN, -1L)
      assert(Seq(r.getLong(2), r.getLong(3), r.getLong(4)) == want.toSeq,
        s"user ${r.getLong(0)} recent buffer mismatch")
    }
    val tc = StreamOps.sq17StreamTypeCounts(spark, dir).collect()
    tc.foreach { r =>
      assert(r.getLong(1) == Seq(2, 3, 4, 5, 6).map(r.getLong).sum,
        "per-type counters must partition the user's total")
    }
  }

  // --------------------------------------------------------------- q138

  test("q138: prefix-filtered join reproduces the full index join exactly") {
    val got = graft.llmops.TextOps.q138PrefixJaccard(spark, dir).collect().map(_.toSeq)
    // the full index join at q138's threshold = q35's exact pairs
    // re-thresholded (both compute exact Jaccard)
    val want = graft.llmops.TextOps.q35JaccardPairs(spark, dir)
      .filter(col("jaccard") >= graft.llmops.TextOps.PrefixJoinT)
      .collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      "prefix filtering must lose no pair at its threshold")
    assert(want.nonEmpty, "sf0.001 must contain pairs above the threshold")
  }

  // --------------------------------------------------------------- sq13

  test("sq13: transformWithState profile equals the batch profile") {
    val got = StreamOps.sq13StreamProfile(spark, dir).collect().map(_.toSeq)
    val gap = graft.queries.Queries.SessionGapUs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val want = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("pus", lag("us", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("pus").isNull || col("us") - col("pus") > gap, 1L)
          .otherwise(0L)).as("n_sessions"),
        expr("min(us) div 1000").as("first_ms"),
        expr("max(us) div 1000").as("last_ms"))
      .orderBy("user_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }
}
