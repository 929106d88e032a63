package graft

import graft.queries.SqlSurfaceOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spark-4 SQL-surface operators: the new syntaxes must PLAN to the
  * classic formulations (sameResult on the optimized plans), not just
  * agree on answers — syntax is sugar, the engine underneath is one. */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("sqlsurface-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q159: the pipe chain optimizes to the same plan as classic SQL") {
    val piped = SqlSurfaceOps.q159PipeSyntax(spark, dir)
    val classic = spark.sql(SqlSurfaceOps.q159Sql)
    assert(piped.queryExecution.optimizedPlan
        .sameResult(classic.queryExecution.optimizedPlan),
      "pipe syntax must be pure sugar over the classic plan")
    assert(piped.collect().map(_.toSeq.mkString("|")).sorted.toSeq ===
      classic.collect().map(_.toSeq.mkString("|")).sorted.toSeq)
  }

  test("q160: VARIANT access agrees with the declared-schema twin (q124)") {
    val v = SqlSurfaceOps.q160VariantShred(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val j = graft.queries.RelOps.q124JsonExtract(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_with_k"), r.getAs[Long]("sum_k"))).toMap
    assert(v === j, "open-schema VARIANT and closed-schema struct must agree")
    SqlSurfaceOps.q160VariantShred(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_miss_null") === r.getAs[Long]("n"),
        "try_variant_get on a missing path is NULL for every row")
    }
  }

  test("q161: collation collapses case variants without a normalize pass") {
    val out = SqlSurfaceOps.q161Collation(spark, dir).collect()
    val types = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type").distinct().count()
    assert(out.length === types,
      "collated groups = canonical types (case variants merged)")
    val direct = graft.sources.TsBridge.normalize(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n") === direct(r.getString(0)),
        "per-type counts survive the re-case + collated regroup")
    }
  }

  test("q162: bound parameters plan exactly like hand-written literals") {
    val p = SqlSurfaceOps.q162ParamSql(spark, dir)
    val lit = spark.sql(SqlSurfaceOps.q162Sql)
    assert(p.queryExecution.optimizedPlan
        .sameResult(lit.queryExecution.optimizedPlan),
      "parameter binding must constant-fold into the literal plan")
    val scan = p.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("o_orderpriority"),
      s"the bound predicate must reach the scan:\n$scan")
  }
}
