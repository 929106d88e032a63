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
  }
}
