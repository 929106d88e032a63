package graft

import graft.llmops.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two connected-components engines behind q67 — min-label
  * propagation (certified default; rounds = component diameter) and
  * alternating large-star/small-star (adaptive; rounds = O(log n)) —
  * must be interchangeable: identical labels wherever both converge,
  * and the adaptive path must survive exactly the graphs that exceed
  * the min-label round budget (round-3 verdict #6/#7).
  */
class CcVariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("cc-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Symmetric edge frame from undirected (a, b) pairs. */
  private def sym(pairs: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    df.union(df.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
  }

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("root"))).toSet

  test("q67 produces identical clusters under both engines on the fixture") {
    // default engine is large/small-star (round-7 promotion); the
    // min-label twin selects via conf and must agree row-for-row
    val base = TextOps.q67DedupClusters(spark, dir).collect().map(_.toString).sorted.toSeq
    spark.conf.set("graft.cc.impl", "minlabel")
    try {
      val ml = TextOps.q67DedupClusters(spark, dir).collect().map(_.toString).sorted.toSeq
      assert(base == ml,
        "min-label must assign the same (doc_id, cluster_root, cluster_size)")
      assert(base.nonEmpty, "fixture should contain near-dup clusters")
    } finally spark.conf.unset("graft.cc.impl")
  }

  test("both engines agree on a multi-component graph with a mid-size chain") {
    // a 20-hop path (converges under min-label's cap), a triangle, an
    // isolated edge — exercises chains, cycles and 2-node components
    val pairs = (0L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val g = sym(pairs)
    val a = labelsOf(TextOps.ccMinLabel(g))
    val b = labelsOf(TextOps.ccLargeSmallStar(g))
    assert(a == b, s"label sets diverge:\nminlabel=$a\nlargestar=$b")
    val expected = (0L to 20L).map(_ -> 0L).toSet ++
      Set(100L -> 100L, 101L -> 100L, 102L -> 100L, 200L -> 200L, 201L -> 200L)
    assert(a == expected)
  }

  test("min-label FAILS LOUDLY past its round cap; large-star converges on the same graph") {
    // a 59-hop path: diameter exceeds MaxCcIters=50, so min-label must
    // raise its pinned convergence error (a test, not a surprise — the
    // failure surface is part of the contract), while the O(log n)
    // star variant finishes in a handful of rounds
    val chain = sym((0L until 59L).map(i => (i, i + 1)))
    val err = intercept[IllegalArgumentException] {
      TextOps.ccMinLabel(chain).collect()
    }
    assert(err.getMessage.contains("did not converge"),
      s"pinned failure message changed: ${err.getMessage}")
    val star = labelsOf(TextOps.ccLargeSmallStar(chain))
    assert(star == (0L to 59L).map(_ -> 0L).toSet,
      "large-star must label the whole chain with root 0")
  }
}
