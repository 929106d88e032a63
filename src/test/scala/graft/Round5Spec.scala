package graft

import graft.llmops.VectorOps
import graft.queries.Queries
import graft.streaming.StreamOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 operators: funnel (q82), quota capping (q83), PQ+ADC
  * (q84), streaming sessionization (sq6). */
class Round5Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round5-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q82 funnel: the three conditional window minima share ONE user_id shuffle") {
    val plan = Queries.q82Funnel(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "funnel must not join — windows over one partitioning")
    val userExchanges = "hashpartitioning\\(user_id#\\d+L, \\d+\\)".r.findAllIn(plan).length
    assert(userExchanges == 1,
      s"chained step windows must reuse a single user_id Exchange, found $userExchanges:\n$plan")
    assert("Window".r.findAllIn(plan).length >= 3,
      "t1/t2/t3 are three Window nodes on the shared sort")
    // the per-user pre-aggregate replaces the four count_distincts:
    // no Expand may survive anywhere (the old plan expanded every
    // event row 4x before partial aggregation)
    assert(!plan.contains("Expand"),
      s"distinct counts must resolve via the per-user pre-aggregate, not Expand:\n$plan")
  }

  test("q82 funnel: steps are monotonically non-increasing") {
    val r = Queries.q82Funnel(spark, dir).collect().head
    val (users, v, vc, vcp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(v <= users && vc <= v && vcp <= vc,
      s"funnel must narrow: $users >= $v >= $vc >= $vcp")
  }

  test("q83 quota: partial-agg selection equals the window row_number formulation") {
    val expected = {
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("rk", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= Queries.QuotaCap, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") <= Queries.QuotaCap, col("doc_id"))).as("kept_id_sum"))
        .orderBy("source")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    val got = Queries.q83SourceQuota(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sameElements(expected),
      "QuotaAggregator must select exactly the window twin's survivors")
  }

  test("q83 quota: no per-source global sort — selection resolves in partial aggregation") {
    val plan = Queries.q83SourceQuota(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the production path must not run the row_number window")
    assert(plan.contains("partial_quotaaggregator") ||
      "ObjectHashAggregate|SortAggregate".r.findAllIn(plan).nonEmpty,
      s"quota must partial-aggregate map-side:\n$plan")
  }

  test("q83 quota: a source with fewer docs than the cap keeps everything") {
    val s = spark
    import s.implicits._
    val tiny = java.nio.file.Files.createTempDirectory("q83tiny")
    try {
      (1L to 3L).map(i => (i, s"t$i", "pt", "lone", 2L)).toSeq
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tiny/documents.parquet")
      val r = Queries.q83SourceQuota(spark, tiny.toString).collect().head
      assert(r.getLong(1) == 3 && r.getLong(2) == 3 && r.getLong(3) == 6,
        "under-cap source must keep all docs")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tiny.toFile)
    }
  }

  test("q84 PQ/ADC: recall is well above the random-pick baseline and bounded") {
    val r = VectorOps.q84PqAdcRecall(spark, dir).collect().head
    val (nq, hits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nq > 0 && hits >= 0)
    // uniform synthetic vectors are PQ's worst case; random top-5 picks
    // score ~TopK/(n-1) ≈ 0.01 — the codec must beat that clearly
    val baseline = VectorOps.TopK.toDouble / (nq - 1).max(1)
    assert(recall > 3 * baseline && recall <= 1.0,
      s"ADC recall $recall must beat random $baseline by 3x+")
  }

  test("q85 audio energy: codegen'd window energy, one media_id exchange, no join") {
    val plan = graft.llmops.MultimodalOps.q85AudioEnergy(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "audio energy must not join")
    assert(plan.toLowerCase.contains("bytewindowenergy"),
      s"window energy must be the codegen'd slice loop, not the byte explode:\n$plan")
    // the per-byte explode's extra (media_id, w_i) aggregation is gone:
    // the run-length window provides the single media_id exchange and
    // the final aggregation reuses it
    val exchanges = "Exchange hashpartitioning\\(media_id".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"window rows must shuffle once on media_id, found $exchanges:\n$plan")
    assert("partial_sum|partial_count".r.findAllIn(plan).nonEmpty,
      s"window->file agg must map-side combine:\n$plan")
  }

  test("q86 thumbnail: pure per-row map — no join, no aggregate") {
    val plan = graft.llmops.MultimodalOps.q86Thumbnail(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"resize must stay a per-row map:\n$plan")
  }

  test("sq6 streaming sessionization equals the batch lag/cumsum result (q22)") {
    val got = StreamOps.sq6Sessionize(spark, dir).collect()
    val want = Queries.q22Sessionize(spark, dir).collect()
    assert(got.length == want.length && got.sameElements(want),
      "flatMapGroupsWithState sessions must equal the batch window sessions")
  }
}
