package graft

import graft.operators.ProgressTicker
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** O22: the running-progress ticker (reference logs every 100k sends
  * with running MB — ProdutorAvro.java:24,81-85). Asserts ticks fire on
  * a multi-partition action, at exact interval multiples, with a
  * growing MB figure. */
class ProgressTickerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("ticker-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ticks fire at interval multiples on a multi-partition scan") {
    val ticks = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    ProgressTicker.withTicker(spark, every = 500,
        sink = (c, mb) => ticks.synchronized { ticks += ((c, mb)) }) {
      // the committed fixture: 5000 messages, 18 partition groups
      val n = spark.read.parquet(graft.sources.GenFixtures.MessagesPath)
        .filter(org.apache.spark.sql.functions.col("sequencia") > 0)
        .count()
      assert(n == 5000)
    }
    val counts = ticks.map(_._1).toSeq
    assert(counts.nonEmpty, "expected progress ticks on a 5000-record scan")
    assert(counts == (500L to counts.last by 500L),
      s"ticks must be consecutive interval multiples: $counts")
    // running MB is cumulative
    val mbs = ticks.map(_._2).toSeq
    assert(mbs.zip(mbs.tail).forall { case (a, b) => b >= a })
  }

  test("no ticks below the interval; totals still accumulate") {
    val ticks = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    ProgressTicker.withTicker(spark, every = 1_000_000,
        sink = (c, mb) => ticks.synchronized { ticks += ((c, mb)) }) {
      spark.read.parquet(graft.sources.GenFixtures.MessagesPath).count()
    }
    assert(ticks.isEmpty)
  }
}
