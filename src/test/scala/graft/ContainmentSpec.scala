package graft

import graft.llmops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q88 containment dedup: the asymmetric doc-in-doc metric. Pins
  * (a) the motivating case symmetric Jaccard structurally misses —
  * a small doc fully embedded in a large one, (b) soundness of the
  * capped candidate bound against the layout-free full-index
  * recompute on the fixture, and (c) the emitted value semantics. */
class ContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("containment-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Crafted (doc_id, shingle) rows: distinct shingles per doc. */
  private def shingleRows(docs: (Long, Seq[String])*): DataFrame = {
    val s = spark
    import s.implicits._
    docs.flatMap { case (id, sh) => sh.distinct.map(x => (id, x)) }
      .toDF("doc_id", "shingle")
  }

  test("small-in-big: containment catches what Jaccard misses") {
    // doc 2 (18 shingles) is fully contained in doc 1 (90 shingles):
    // containment 1.0, Jaccard 18/90 = 0.2 — under every symmetric
    // near-dup threshold in the module
    val big = (0 until 90).map(i => s"s$i")
    val small = (0 until 18).map(i => s"s$i")
    val out = TextOps.containmentOf(shingleRows(1L -> big, 2L -> small)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("cont_a") == 18.0 / 90.0)
    assert(r.getAs[Double]("cont_b") == 1.0)
    val jaccard = 18.0 / (90 + 18 - 18)
    assert(jaccard < 0.5, "premise: the pair is invisible to the Jaccard rule")
  }

  test("sub-threshold containment emits nothing") {
    // 12 of 18 shared = 0.667 max containment < 0.8
    val big = (0 until 90).map(i => s"s$i")
    val partial = (0 until 12).map(i => s"s$i") ++ (0 until 6).map(i => s"x$i")
    val out = TextOps.containmentOf(shingleRows(1L -> big, 2L -> partial)).collect()
    assert(out.isEmpty)
  }

  test("hot-shingle bound keeps a pair alive through candidate generation") {
    // the contained doc's shingles are mostly HOT (df > MaxShingleDf via
    // 25 background docs), but ONE rare shared shingle anchors the pair
    // and least(hot_a, hot_b) lifts the bound over the threshold
    val hot = (0 until 17).map(i => s"h$i")
    val big = hot ++ Seq("rare1") ++ (0 until 72).map(i => s"b$i")
    val small = hot ++ Seq("rare1")
    val background = (10L until 35L).map(id => id -> hot)
    val out = TextOps.containmentOf(
      shingleRows(Seq(1L -> big, 2L -> small) ++ background: _*)).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, "all-but-one-hot containment pair must survive the cap")
    assert(pair.get.getAs[Double]("cont_b") == 1.0)
  }

  test("capped pipeline equals the layout-free full-index recompute") {
    // the q39-style empirical identity: on the fixture, candidates from
    // rare shingles + the hot upper bound lose no qualifying pair
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tk")))
      .withColumn("t2", lead("tk", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .withColumn("t3", lead("tk", 2).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tk"), col("t2"), col("t3")).as("shingle"))
      .distinct()
    val capped = TextOps.containmentOf(rows).collect().map(_.toSeq)
    val full = {
      val ex = rows.withColumn("n_sh",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      val a = ex.select(col("doc_id").as("doc_a"), col("n_sh").as("na"), col("shingle"))
      val b = ex.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"), col("shingle"))
      a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb").agg(count(lit(1)).as("common"))
        .select(col("doc_a"), col("doc_b"),
          (col("common").cast("double") / col("na")).as("cont_a"),
          (col("common").cast("double") / col("nb")).as("cont_b"))
        .filter(greatest(col("cont_a"), col("cont_b")) >= TextOps.ContainThresh)
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq)
    }
    assert(capped.nonEmpty, "fixture must exercise the containment path")
    assert(capped.sameElements(full),
      s"capped candidates lost pairs: ${full.length} full vs ${capped.length} capped")
  }
}
