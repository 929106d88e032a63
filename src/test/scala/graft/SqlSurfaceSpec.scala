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
    // the classic twin binds through the same dir-scoped views the
    // engine entry registers (bare names are no longer registered —
    // round-9 ADVICE temp-view scoping)
    val classic = graft.queries.ScopedSql.run(spark, dir, SqlSurfaceOps.q159Sql,
      "lineitem" -> spark.read.parquet(s"$dir/lineitem.parquet"))
    assert(piped.queryExecution.optimizedPlan
        .sameResult(classic.queryExecution.optimizedPlan),
      "pipe syntax must be pure sugar over the classic plan")
    assert(piped.collect().map(_.toSeq.mkString("|")).sorted.toSeq ===
      classic.collect().map(_.toSeq.mkString("|")).sorted.toSeq)
  }

  test("ScopedSql.rewriteToken never touches literals, comments, or backticks") {
    val t = graft.queries.ScopedSql.rewriteToken(
      "SELECT 'orders' AS lbl, `orders`, o.x -- orders here\n" +
        "FROM orders o /* join orders later */ JOIN orders_hist USING (k)\n" +
        "WHERE note <> 'no orders yet'",
      "orders", "orders_g1")
    // bare table tokens rewritten
    assert(t.contains("FROM orders_g1 o"))
    // string literals, backtick identifiers, line and bracketed
    // comments, and words merely PREFIXED by the name are untouched
    assert(t.contains("'orders' AS lbl"))
    assert(t.contains("`orders`"))
    assert(t.contains("-- orders here"))
    assert(t.contains("/* join orders later */"))
    assert(t.contains("orders_hist"))
    assert(t.contains("'no orders yet'"))
    // backslash-escaped quote inside a literal (Spark accepts 'it\'s'
    // by default): the span must not mis-terminate at the \' — a table
    // token after it stays inside the literal, untouched
    val b = graft.queries.ScopedSql.rewriteToken(
      "SELECT 'it\\'s an orders day' AS lbl FROM orders", "orders", "orders_g1")
    assert(b.contains("'it\\'s an orders day'"), b)
    assert(b.contains("FROM orders_g1"), b)
    // '' escaping still protected alongside
    val d = graft.queries.ScopedSql.rewriteToken(
      "SELECT 'the ''orders'' table' FROM orders", "orders", "orders_g1")
    assert(d.contains("'the ''orders'' table'"), d)
    assert(d.contains("FROM orders_g1"), d)
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

  test("q163: analytic ratios are exact rank arithmetic") {
    val rows = SqlSurfaceOps.q163WindowZoo(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd) = (r.getAs[Double]("pr"), r.getAs[Double]("cd"))
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      assert(r.getAs[Double]("min_p") <= r.getAs[Double]("o_totalprice") &&
        r.getAs[Double]("o_totalprice") <= r.getAs[Double]("max_p"))
    }
  }

  test("q164: multiset identities hold (|A∖B|ALL = |A| − |A∩B|ALL, union adds)") {
    val r = SqlSurfaceOps.q164SetopsAll(spark, dir).head()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val nA = li.filter(col("l_returnflag") === "R").count()
    val nB = li.filter(col("l_returnflag") === "A").count()
    assert(r.getAs[Long]("n_intersect_all") >= r.getAs[Long]("n_intersect"))
    assert(r.getAs[Long]("n_except_all") ===
      nA - r.getAs[Long]("n_intersect_all"),
      "EXCEPT ALL removes exactly min-multiplicity matches")
    assert(r.getAs[Long]("n_union_all") === nA + nB)
  }

  test("q165: the keyset page is byte-identical to the OFFSET page") {
    import org.apache.spark.sql.expressions.Window
    val keyset = SqlSurfaceOps.q165Paginate(spark, dir).collect()
      .map(_.toSeq.mkString("|"))
    val offset = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") > SqlSurfaceOps.PageSize * SqlSurfaceOps.PageSkip &&
        col("rn") <= SqlSurfaceOps.PageSize * (SqlSurfaceOps.PageSkip + 1))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(_.toSeq.mkString("|"))
    assert(keyset.toSeq === offset.toSeq)
  }

  test("q165 plan: the boundary read is rank-pushed, not a global full sort") {
    // The O(page) claim rests on Spark's rank-limit pushdown turning
    // the no-partition row_number + `rn === 40` filter into a top-k
    // (WindowGroupLimit); nothing else in the suite would notice a
    // regression to a single-partition full sort (round-9 ADVICE —
    // mirror of the q148/q149 plan-shape checks).
    import org.apache.spark.sql.expressions.Window
    val boundary = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") === SqlSurfaceOps.PageSize * SqlSurfaceOps.PageSkip)
    val plan = boundary.queryExecution.executedPlan.toString
    // a no-partition window pushes its rank limit as a global top-k
    // (TakeOrderedAndProject limit=40); partitioned windows would show
    // WindowGroupLimit — either proves the read is O(page), not O(table)
    assert(plan.contains("TakeOrderedAndProject") ||
        plan.contains("WindowGroupLimit"),
      "q165's boundary read must plan as a rank-pushed top-k " +
        "(TakeOrderedAndProject or WindowGroupLimit); a full global " +
        s"sort is O(table), got:\n$plan")
  }

  test("q166: GROUP BY ALL infers exactly the non-aggregate columns") {
    val sugar = SqlSurfaceOps.q166GroupByAll(spark, dir).collect()
      .map(_.toSeq.mkString("|"))
    val explicit = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus").collect()
      .map(_.toSeq.mkString("|"))
    assert(sugar.toSeq === explicit.toSeq)
  }

  test("q170: hints flip the physical join; no strategy changes the answer") {
    val plan = SqlSurfaceOps.q170JoinHints(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "the merge hint must force SMJ")
    assert(plan.contains("ShuffledHashJoin"),
      "the shuffle_hash hint must force a shuffled hash join")
    assert(plan.contains("BroadcastHashJoin"),
      "the unhinted leg keeps the optimizer's broadcast choice")
    val rows = SqlSurfaceOps.q170JoinHints(spark, dir).collect()
    val byStrategy = rows.groupBy(_.getAs[String]("strategy"))
      .view.mapValues(_.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq).toMap
    assert(byStrategy.size === 3)
    assert(byStrategy("merge") === byStrategy("default") &&
      byStrategy("shuffle_hash") === byStrategy("default"),
      "strategy must never change the answer")
  }

  test("q171: the lambda pipeline profiles every vector, fused (no explode)") {
    val rows = SqlSurfaceOps.q171HofZoo(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_finite") === r.getAs[Long]("n"),
        "the clean fixture has no NaN components (forall pins it)")
      assert(r.getAs[Double]("mean_ssq") > 0.0)
    }
    val plan = SqlSurfaceOps.q171HofZoo(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "HOFs must fuse into the projection — no explode fan-out")
  }

  test("q172: quarters tile the order dates; month counts stay calendar-bounded") {
    val rows = SqlSurfaceOps.q172CalendarZoo(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_months") >= 1 && r.getAs[Long]("n_months") <= 3,
        "a quarter holds at most three months")
      assert(r.getAs[Int]("min_doy") >= 1 && r.getAs[Int]("max_doy") <= 366)
    }
  }

  test("q162: bound parameters plan exactly like hand-written literals") {
    val p = SqlSurfaceOps.q162ParamSql(spark, dir)
    val lit = graft.queries.ScopedSql.run(spark, dir, SqlSurfaceOps.q162Sql,
      "orders" -> spark.read.parquet(s"$dir/orders.parquet"))
    assert(p.queryExecution.optimizedPlan
        .sameResult(lit.queryExecution.optimizedPlan),
      "parameter binding must constant-fold into the literal plan")
    val scan = p.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("o_orderpriority"),
      s"the bound predicate must reach the scan:\n$scan")
  }
}
