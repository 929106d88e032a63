package graft

import graft.operators.SkewOps
import graft.queries.Queries
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale-technique checks: custom stateful sessionization equals the
  * declarative batch query, salted aggregation equals direct
  * aggregation, bucketed co-located joins avoid the shuffle, and the
  * custom expressions are reachable from SQL. */
class ScaleOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("scale-test", cores = 4)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    GraftSession.registerFunctions(spark)
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stateful sessionization (flatMapGroupsWithState) equals batch q22") {
    val batch = Queries.q22Sessionize(spark, dir).collect()
    val stateful = StreamOps.sessionizeBatch(spark, dir, Queries.SessionGapUs).collect()
    assert(stateful.length == batch.length,
      s"session counts differ: stateful ${stateful.length} vs batch ${batch.length}")
    assert(stateful.sameElements(batch))
  }

  test("salted aggregation equals direct aggregation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val direct = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total"))
      .orderBy("lang").collect()
    val salted = SkewOps.saltedCountSum(docs, Seq("lang"), col("n_chars"),
        idCol = col("doc_id"), salts = 16)
      .orderBy("lang").collect()
    assert(salted.sameElements(direct))
  }

  test("salted join equals plain join (q51 vs direct)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect()
    // threshold inside lineitem's 1-7 rows-per-order fan-out: some
    // orderkeys salt, the rest take the cold path — both verified
    val salted = SkewOps.saltedJoin(li, o, "l_orderkey", "o_orderkey",
        idCol = col("l_orderkey") + col("l_quantity"), salts = 8,
        hotRowThreshold = 3)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect()
    assert(salted.sameElements(direct))
  }

  test("salted build side amplifies by hot keys x salts, not |build| x salts") {
    // key 1: 1000 probe rows (hot); keys 2..100: one row each (cold)
    val probe = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
      .unionAll(spark.range(2, 101).toDF("id").select(col("id").as("k"), col("id").as("v")))
    val build = spark.range(1, 101).select(col("id").as("bk"), (col("id") * 10).as("w"))
    val sb = SkewOps.saltedBuildSide(build, "bk",
      salts = 8, hotDf = SkewOps.hotKeys(probe, "k", 100))
    // 1 hot build row x 8 salts + 99 cold rows x 1 — the round-2 shape
    // shipped |build| x salts = 800
    assert(sb.count() == 1 * 8 + 99,
      "build amplification must track hot keys, not the whole build side")
    val direct = probe.join(build, col("k") === col("bk")).count()
    val salted = SkewOps.saltedJoin(probe, build, "k", "bk",
      idCol = col("v"), salts = 8, hotRowThreshold = 100).count()
    assert(salted == direct)
  }

  test("sketch aggregates (q52) pin their bound booleans true") {
    // the error-bound checks now live IN the query (within_bounds
    // booleans the DuckDB oracle pins true); this just exercises them
    val rows = Queries.q52Sketches(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("users_within_bounds", "p50_within_bounds", "p90_within_bounds").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for ${r.getAs[String]("event_type")}")
      }
    }
  }

  test("CMS heavy hitters (q80): ranked exactly, bounds pinned, deterministic") {
    // the bound check is computed IN-QUERY: the probe expression is in
    // the plan and no driver-materialized local relation replaces the
    // distributed candidates (round-5 verdict #3)
    val plan = Queries.q80CmsTopk(spark, dir).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("cmsestimate"),
      s"within_bounds must probe the sketch via the CmsEstimate expression:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"q80 must not collect candidates to the driver:\n$plan")
    val rows = Queries.q80CmsTopk(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Queries.HhTopK)
    // contiguous ranks, counts descending with doc-id tiebreak
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("hh_rank") == i + 1)
      assert(r.getAs[Boolean]("within_bounds"),
        s"CMS bound violated for user ${r.getAs[Long]("user_id")}")
    }
    val cnts = rows.map(_.getAs[Long]("exact_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // fixed seed -> bit-identical rerun
    val again = Queries.q80CmsTopk(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previously-crashed run can leave the managed location behind
    // with no catalog entry; Spark then refuses the CREATE
    Seq("li_b", "o_b").foreach { t =>
      val loc = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("custom expressions are callable from SQL") {
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
    val rt = spark.sql(
      """SELECT graft_from_avro(graft_to_avro(named_struct(
        |  'id', 'x', 'timestamp', 1L, 'sequencia', 2L,
        |  'dados', array(named_struct('indice', 0, 'texto', 't', 'numero', 1.5D,
        |                              'timestamp', 3L, 'uuid', 'u')),
        |  'versao', '1.0'))).sequencia AS seq""".stripMargin)
      .head().getLong(0)
    assert(rt == 2L)
    // round-6 expressions: window energy over a known byte slice...
    val e = spark.sql(
      "SELECT graft_win_energy(X'00FF80', 0L, 3) AS e").head().getLong(0)
    assert(e == 128L * 128 + 127 * 127 + 0, s"energy was $e")
    // ...and the sketch probes, fed by their builder aggregates
    val cms = spark.sql(
      """SELECT graft_cms_estimate(
        |  (SELECT count_min_sketch(x, 0.01D, 0.99D, 42) FROM range(5) v(x)),
        |  3L) AS c""".stripMargin).head().getLong(0)
    assert(cms >= 1L, s"cms estimate was $cms")
  }
}
