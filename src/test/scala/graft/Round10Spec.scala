package graft

import graft.llmops.{TextOps, VectorOps}
import graft.queries.Queries
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Engine-side invariants for the round-10 operator batch (q107 span
  * dedup, q108 Gopher rules, q109 JL projection, q110 token entropy,
  * sq11 stream-stream left-outer join). Cross-engine value equality is
  * the DuckDB oracle's job at the sf0.01 gate; these pin semantics the
  * oracle can't see (plan shape, invariant relations, streaming/batch
  * equivalence). */
class Round10Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round10-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ------------------------------------------------------------- q107

  test("q107: spans are maximal, disjoint, in-bounds cut intervals") {
    val spans = TextOps.q107SpanDedup(spark, dir).collect()
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.foreach { r =>
      val (s0, e0, l) = (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
        r.getAs[Long]("span_len"))
      assert(l == e0 - s0 + 1, "span_len must match the interval")
      assert(l >= TextOps.DupGramN, "a span covers at least one full gram")
      assert(s0 >= 0 && e0 < lens(r.getAs[Long]("doc_id")), "span inside the doc")
    }
    // disjoint AND maximal per doc: consecutive spans are separated by
    // more than a gram length (else the island merge would have fused
    // them into one interval)
    spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      g.map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
        .sortBy(_._1).sliding(2).foreach {
          case Array((_, e1), (s2, _)) =>
            assert(s2 > e1 + 1, "adjacent covered tokens must merge into one span")
          case _ =>
        }
    }
  }

  test("q107 agrees with q77: same docs carry duplicated grams") {
    val spanDocs = TextOps.q107SpanDedup(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val q77Docs = TextOps.q77DupNgramCoverage(spark, dir)
      .filter(col("n_dup") > 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(spanDocs == q77Docs)
  }

  // ------------------------------------------------------------- q108

  test("q108: six rule rows, consistent counts and ratios") {
    val rows = TextOps.q108GopherRules(spark, dir).collect()
    assert(rows.map(_.getAs[String]("rule")).toSet ==
      Set("word_count", "mean_word_len", "unique_ratio", "top_word_ratio",
        "stopword_min", "pass_all"))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val byRule = rows.map(r => r.getAs[String]("rule") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n >= 0 && n <= nDocs)
      assert(math.abs(r.getAs[Double]("ratio") - n.toDouble / nDocs) < 1e-6)
    }
    // pass_all cannot exceed the best rule's pass count
    val maxFail = (byRule - "pass_all").values.max
    assert(byRule("pass_all") <= nDocs - maxFail)
  }

  // ------------------------------------------------------------- q110

  test("q110: entropy bounded by ln(n_distinct), zero iff single-type doc") {
    val rows = TextOps.q110TokenEntropy(spark, dir).collect()
    assert(rows.length ==
      spark.read.parquet(s"$dir/documents.parquet").count())
    rows.foreach { r =>
      val (nt, nd, h) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
        r.getAs[Double]("entropy"))
      assert(nd <= nt)
      assert(h >= -1e-9, "entropy is non-negative")
      assert(h <= math.log(nd.toDouble) + 1e-6, "H <= ln(types)")
      if (nd == 1) assert(math.abs(h) < 1e-9)
    }
  }

  // ------------------------------------------------------------- q109

  test("q109: consecutive-pair panel, JL distortion concentrated near 1") {
    val rows = VectorOps.q109JlProjection(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length == n - 1, "one row per consecutive id pair")
    val ratios = rows.map(_.getAs[Double]("ratio"))
    assert(ratios.forall(_ > 0.0))
    val within = rows.count(_.getAs[Boolean]("within_eps"))
    // 16-dim Rademacher JL: ratio^2 concentrates with std ~ sqrt(2/16);
    // well over half the pairs must sit inside the ±25% band
    assert(within.toDouble / rows.length > 0.5,
      s"only $within/${rows.length} pairs within eps")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean drifted")
  }

  test("q109: projection matrix is deterministic ±1/4 with balanced signs") {
    val m = VectorOps.jlPlanes
    assert(m.length == VectorOps.ProjDim && m.forall(_.length == VectorOps.Dim))
    val flat = m.flatMap(_.toSeq).toSeq
    assert(flat.forall(x => x == 0.25 || x == -0.25))
    val tot = VectorOps.ProjDim * VectorOps.Dim
    assert(math.abs(flat.count(_ > 0).toDouble / tot - 0.5) < 0.1, "sign balance")
    assert(VectorOps.jlPlanes.flatMap(_.toSeq).toSeq == flat, "deterministic")
  }

  // ------------------------------------------------------------- sq11

  test("sq11: matched rows = sq3 inner join; null rows = watermark-closed non-conversions") {
    val df = StreamOps.sq11StreamLeftJoin(spark, dir)
    val out = df.collect()
    val pi = df.schema.fieldIndex("purchase_id")
    val matched = out.filter(!_.isNullAt(pi))
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
    val nullClicks = out.filter(_.isNullAt(pi)).map(_.getAs[Long]("click_id"))
    assert(nullClicks.distinct.length == nullClicks.length,
      "one null-extended row per unconverted click")

    val inner = StreamOps.sq3StreamJoin(spark, dir).collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
    assert(matched == inner, "outer join's matched rows equal the inner join")

    // expected unmatched set, batch-computed: clicks with no purchase in
    // window whose window closed under the final global watermark
    val ev = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val maxC = c.agg(max(unix_millis(col("cts")))).head().getLong(0)
    val maxP = p.agg(max(unix_millis(col("pts")))).head().getLong(0)
    val wmMs = math.min(maxC, maxP) - 2L * 3600 * 1000
    val expected = c
      .join(p, c("user_id") === p("user_id") &&
        p("pts") >= c("cts") &&
        p("pts") <= c("cts") + expr("INTERVAL 1 HOUR"), "left_anti")
      .filter(unix_millis(col("cts")) + 3600L * 1000 < wmMs)
      .select("click_id").collect().map(_.getLong(0)).toSet
    assert(nullClicks.toSet == expected,
      s"unmatched clicks ${nullClicks.toSet.size} vs expected ${expected.size}")
  }

  // ------------------------------------------------------------- q111

  test("q111: integer apportionment sums exactly to the budget, √-ordered") {
    val rows = TextOps.q111TemperatureMix(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("target_n")).sum == n / 2,
      "largest-remainder apportionment must hit the budget exactly")
    // √-temperature flattens: bigger sources get SMALLER keep ratios
    val bySize = rows.sortBy(_.getAs[Long]("n_docs"))
    bySize.map(_.getAs[Double]("keep_ratio")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 0.05, "keep_ratio ~monotone down in size")
      case _ =>
    }
    rows.foreach(r => assert(r.getAs[Long]("target_n") >= 0))
  }

  // ------------------------------------------------------------- q112

  test("q112: flags are |z| >= threshold with user-local baselines") {
    val rows = Queries.q112UserAnomaly(spark, dir).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) >= Queries.AnomalyZ)
      assert(r.getAs[Long]("n_events") >= 1)
    }
    // a user must have at least AnomalyMinHours distinct hours to be
    // eligible — verify against the raw per-user hour counts
    val ev = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val hoursPerUser = ev
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h")).distinct()
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(hoursPerUser(r.getAs[Long]("user_id")) >= Queries.AnomalyMinHours)
    }
  }

  // ------------------------------------------------------------- sq12

  test("sq12: chained streaming rollup equals batch rollup over closed hours") {
    val got = StreamOps.sq12StreamRollup(spark, dir).collect()
      .map(r => (r.getAs[Long]("janela_ms"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_subwindows"))).toSet
    val ev = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val wmMs = ev.agg(max(unix_millis(col("ts")))).head().getLong(0) -
      2L * 3600 * 1000
    val expected = ev
      .groupBy(window(col("ts"), "15 minutes").as("w15"), col("event_type"))
      .agg(count(lit(1)).as("n15"))
      .groupBy(window(window_time(col("w15")), "1 hour").as("w1h"), col("event_type"))
      .agg(sum("n15").as("n_events"), count(lit(1)).as("n_subwindows"))
      .filter(unix_millis(col("w1h.end")) <= wmMs)
      .select(unix_millis(col("w1h.start")).as("janela_ms"), col("event_type"),
        col("n_events"), col("n_subwindows"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"${got.size} streaming vs ${expected.size} batch rows")
  }
}
