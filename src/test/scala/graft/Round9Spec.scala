package graft

import graft.llmops.TextOps
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 streaming/corpus operators: the chained stream-stream join
  * equals its batch twin, and the cluster-granular split is actually
  * leakage-safe (no near-dup pair straddles splits). */
class Round9Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("round9-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("sq18: cascaded stream-stream joins equal the batch 3-way interval join") {
    val streamed = StreamOps.sq18StreamJoinChain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val e = graft.sources.TsBridge.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    def side(t: String, p: String) = e.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
        col("ts").as(s"${p}_ts"))
    val batch = side("view", "view")
      .join(side("click", "click"),
        expr("""view_user = click_user AND click_ts >= view_ts
               |AND click_ts <= view_ts + INTERVAL 6 HOURS""".stripMargin))
      .join(side("purchase", "purchase"),
        expr("""click_user = purchase_user AND purchase_ts >= click_ts
               |AND purchase_ts <= click_ts + INTERVAL 12 HOURS""".stripMargin))
      .select(col("view_user"), col("view_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("funnel_us"))
      .orderBy("view_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(streamed.nonEmpty, "the funnel windows must produce matches at sf0.001")
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q147: the split table partitions the corpus and every split is populated") {
    val rows = TextOps.q147ClusterSplit(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits === Set("train", "val", "test"))
    // 2-hex-char fenceposts: train ≈ 205/256, val ≈ 25/256 — at corpus
    // size the realized shares stay in loose bounds
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit("train").toDouble / docs > 0.6, s"train share collapsed: $bySplit")
    assert(bySplit("test").toDouble / docs < 0.3, s"test share exploded: $bySplit")
  }

  test("q156: observed in-flight metrics equal a direct recomputation") {
    val r = graft.queries.MiningOps.q156ObservedMetrics(spark, dir).head()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(r.getAs[Long]("obs_rows") === li.count())
    val direct = li.agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(r.getAs[Double]("obs_qty") - direct) < 1e-9)
    assert(r.getAs[Boolean]("rows_consistent") && r.getAs[Boolean]("no_nulls"))
  }

  test("q157: the dynamic overwrite replaced exactly the en partition") {
    val out = graft.queries.MiningOps.q157DynamicOverwrite(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").agg(count(lit(1)), sum(col("n_chars")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === direct.keySet, "no partition may vanish (static-mode data loss)")
    out.foreach { case (lang, (n, sum)) =>
      val (dn, dsum) = direct(lang)
      assert(n === dn, s"$lang row count must survive the overwrite")
      if (lang == "en") assert(sum === -dsum, "en was replaced by the transformed batch")
      else assert(sum === dsum, s"$lang must be untouched")
    }
  }

  test("q158: propagation is deterministic and grades only the holdout") {
    val rows = graft.llmops.VectorOps.q158LabelProp(spark, dir).collect()
    assert(rows.nonEmpty)
    val nHoldout = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(graft.llmops.VectorOps.PropHoldoutMod)) === 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_eval")).sum <= nHoldout)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
    }
  }

  test("sq19: late batches really drop — emitted volume is between one and two replay thirds") {
    val out = graft.streaming.StreamOps.sq19LateDataAudit(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    val emitted = out.map(_.getAs[Long]("n")).sum
    // batches 1+2 survive the lagged filter (minus open windows),
    // batch 3 drops: emitted sits strictly inside (total/3, total)
    assert(emitted > total / 3 && emitted < total,
      s"emitted $emitted of $total — the drop semantics must bite")
  }

  test("sq20: update-mode emissions track batches-touched; counts are monotone-final") {
    val out = graft.streaming.StreamOps.sq20UpdateMode(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val em = r.getAs[Long]("n_emissions")
      assert(em >= 1 && em <= 3, s"a window is touched by 1..3 replay batches: $r")
    }
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    val kept = out.map(_.getAs[Long]("final_n")).sum
    assert(kept > total / 3 && kept < total,
      s"the lagged filter must bite between one and three thirds: $kept of $total")
  }

  test("q167: the chunk manifest tiles every payload exactly, hashes are content-addressed") {
    val m = graft.llmops.MultimodalOps.q167ChunkManifest(spark, dir).collect()
    assert(m.nonEmpty)
    val byMedia = m.groupBy(_.getAs[Long]("media_id"))
    byMedia.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      // contiguous tiling: chunk i starts where i-1 ended
      def i(r: org.apache.spark.sql.Row, c: String): Long =
        r.getAs[Number](c).longValue()
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(i(a, "off") + i(a, "n_bytes") === i(b, "off"))
      }
      // every chunk but the last is full-size; none is empty
      sorted.init.foreach(c =>
        assert(i(c, "n_bytes") === graft.llmops.MultimodalOps.ChunkBytes.toLong))
      assert(i(sorted.last, "n_bytes") > 0)
    }
    // content addressing: identical chunks hash identically, and the
    // manifest is deterministic across runs
    val again = graft.llmops.MultimodalOps.q167ChunkManifest(spark, dir).collect()
      .map(_.getAs[String]("chunk_hash"))
    assert(again.toSeq === m.map(_.getAs[String]("chunk_hash")).toSeq)
  }

  test("q147: leakage-safe — no q67 near-dup pair straddles two splits") {
    // recompute each doc's split exactly as the query does, then check
    // every clustered doc landed with its root
    val labels = TextOps.q67DedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_root"))
    val h2 = substring(md5(col("cluster_root").cast("string")), 1, 2)
    val splits = labels.withColumn("split",
        when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test"))
      .groupBy("cluster_root")
      .agg(countDistinct(col("split")).as("n_splits"))
      .agg(max(col("n_splits"))).head().getLong(0)
    assert(splits <= 1L, "a near-dup cluster must never straddle splits")
  }
}
