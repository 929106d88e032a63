package graft

import graft.llmops.TextOps
import graft.queries.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: retention cohorts (q97), transition matrix
  * (q98), blocklist filter (q99), Zipf fit (q100), phrase search
  * (q101), and the events.ts vintage bridge. Value equality vs DuckDB
  * is the oracle's job; these pin engine-side invariants, fixture
  * non-vacuity, and the scale-shape choices the Scaladocs claim. */
class Round8Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round8-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("TsBridge: both ts vintages normalize to the same micros") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val us = 1704067200123456L
    val asNanos = spark.createDataFrame(
      List(Row(us * 1000L)).asJava,
      StructType(Seq(StructField("ts", LongType))))
    val asNtz = spark.createDataFrame(
      List(Row(java.time.LocalDateTime.ofEpochSecond(
        us / 1000000, (us % 1000000).toInt * 1000,
        java.time.ZoneOffset.UTC))).asJava,
      StructType(Seq(StructField("ts", TimestampNTZType))))
    for (df <- Seq(asNanos, asNtz)) {
      val out = graft.sources.TsBridge.normalize(df)
      assert(out.schema("ts").dataType == TimestampType)
      assert(out.select(unix_micros(col("ts"))).head().getLong(0) == us)
    }
  }

  test("q97: day-0 retention is 1.0 per cohort; cohort sizes partition the users") {
    val rows = Queries.q97RetentionCohorts(spark, dir).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Int]("day_n") == 0)
    assert(day0.nonEmpty && day0.forall(_.getAs[Double]("retention") == 1.0),
      "every cohort's day 0 must retain 100%")
    val day0Sizes = day0.map(r =>
      r.getAs[java.sql.Date]("cohort_d") -> r.getAs[Long]("n_users")).toMap
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(day0Sizes.values.sum == nUsers,
      s"cohorts must partition the user base: ${day0Sizes.values.sum} vs $nUsers")
    rows.foreach { r =>
      assert(r.getAs[Int]("day_n") >= 0)
      assert(r.getAs[Long]("n_users") <= day0Sizes(r.getAs[java.sql.Date]("cohort_d")),
        s"no day can retain more users than its cohort has: $r")
    }
  }

  test("q98: transitions conserve events; P(to|from) sums to 1 per from") {
    val rows = Queries.q98Transitions(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      "each user contributes exactly (events-1) transitions")
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val p = rs.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(p - 1.0) < 1e-4, s"P(.|$f) must sum to 1, got $p")
    }
  }

  test("q99: hard terms always reject; the fixture exercises all three verdict causes") {
    val rows = TextOps.q99BlocklistFilter(spark, dir).collect()
    assert(rows.length ==
      spark.read.parquet(s"$dir/documents.parquet").count(),
      "the audit emits one row per document")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("soft_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      if (r.getAs[Long]("n_hard") > 0)
        assert(!r.getAs[Boolean]("keep"), s"hard hit must reject: $r")
    }
    assert(rows.exists(r => r.getAs[Long]("n_hard") > 0), "fixture has hard hits")
    assert(rows.exists(r => r.getAs[Long]("n_hard") == 0 &&
      !r.getAs[Boolean]("keep")), "fixture has density-only rejections")
    assert(rows.exists(_.getAs[Boolean]("keep")), "fixture has survivors")
  }

  test("q100: natural-ish fixture slope is negative; rank step is top-K, not a global sort") {
    val df = TextOps.q100ZipfSlope(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "the rank step must be top-K (TakeOrderedAndProject), not a vocabulary-wide Sort")
    val r = df.head()
    val slope = r.getAs[Double]("zipf_slope")
    assert(slope < 0, s"frequencies fall with rank: $slope")
    assert(r.getAs[Long]("n_types") >= 30, "fixture vocabulary present")
    // ln(freq) at rank 1 must not exceed ln(corpus size): intercept sanity
    assert(r.getAs[Double]("zipf_intercept") <=
      math.log(r.getAs[Long]("n_tokens").toDouble))
  }

  test("q101: every hit doc contains the phrase; counts match a direct scan") {
    val hits = TextOps.q101PhraseSearch(spark, dir).collect()
    assert(hits.nonEmpty, "the fixture corpus repeats its top bigram somewhere")
    val ids = hits.map(_.getAs[Long]("doc_id")).toSet
    // recompute the top bigram + per-doc counts independently in Scala
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split("\\s+"))
    val bigrams = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val (w1, w2) = bigrams.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val expected = docs.map { case (id, w) =>
      id -> w.sliding(2).count(p => p.length == 2 && p(0) == w1 && p(1) == w2)
    }.filter(_._2 > 0).toMap
    assert(ids == expected.keySet, s"hit sets differ for phrase ($w1,$w2)")
    hits.foreach { r =>
      assert(r.getAs[Long]("n_hits") == expected(r.getAs[Long]("doc_id")))
    }
  }
}
