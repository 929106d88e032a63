package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Round-8 second-wave relational/time-series/graph operators
  * (SURVEY.md §2.3): bloom-filter semi-join reduction, time-series
  * gap-fill (LOCF), RANGE-framed rolling windows, degree-ordered
  * triangle counting, and the 2-D skyline (Pareto frontier).
  *
  * Same oracle-parity rules as [[Queries]] (FIXTURES.md §D): exact
  * DECIMAL sums under double outputs, stable ORDER BY in both
  * dialects, identical expression shapes, timestamps as epoch ms/us.
  */
object RelOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper TimestampType (both fixture
    * vintages), the [[Queries]] discipline. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.TsBridge.normalize(t(s, dir, "events"))

  private def dec(c: Column, p: Int, sc: Int): Column = c.cast(DecimalType(p, sc))

  // ------------------------------------------------ q113 bloom-filter join

  /** Bloom geometry: k hash probes, target bits per build-side key,
    * and a hard cap on the broadcast bitset (2^22 bits = 512 KiB —
    * comfortably a literal/broadcast at any plausible build size; a
    * build side too big for the cap is past the point where semi-join
    * reduction pays anyway). */
  val BloomK = 4
  val BloomBitsPerKey = 16
  val BloomMaxBits: Long = 1L << 22

  /** 2^j lookup — turns variable-distance bit shifts into an
    * `element_at` over a 64-long literal, keeping the whole bloom
    * probe inside builtin codegen'd expressions (shiftleft/shiftright
    * Column variants take literal distances only). */
  private val pow2: Column = typedLit(Array.tabulate(64)(j => 1L << j))

  private def bloomHashes(key: Column, m: Long): Seq[Column] =
    (0 until BloomK).map(i => pmod(xxhash64(key, lit(i)), lit(m)))

  /** h div 64 for h < 2^22: exact in double, truncation = floor. */
  private def wordIdx(h: Column): Column = (h.cast("double") / 64.0).cast("int")

  private def bitMask(h: Column): Column =
    element_at(pow2, (h % 64).cast("int") + 1)

  /** q113: BLOOM-FILTER SEMI-JOIN REDUCTION — the runtime-filter
    * discipline for big⋈selective joins: build a bloom filter over
    * the qualifying build-side keys (urgent orders), broadcast it as
    * a literal word array, and pre-filter the probe side (lineitem)
    * BEFORE its shuffle; the exact equi-join then removes the bloom's
    * false positives, so the rewrite is identity-preserving and the
    * oracle is the plain join SQL (the q51 pattern: a physical
    * strategy must not change the answer).
    *
    * Scale shape: at 100 TB the probe side's shuffle is the dominant
    * cost and the bloom cuts it by the build side's selectivity
    * (~80% here) for 512 KiB of broadcast state; Spark's own runtime
    * row-group filters only reach partitioned scans, this works on
    * any probe relation. The filter builds DISTRIBUTED: each key
    * explodes to k (word, mask) pairs, `bit_or` partial-aggregates
    * map-side, and the driver reads back at most m/64 ≤ 65,536 word
    * rows (bounded by [[BloomMaxBits]], not by the data). Probe-side
    * membership is pure builtin expressions (xxhash64 → element_at →
    * bitwiseAND) — whole-stage codegen, no UDF. */
  def q113BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // bounded action: one count sizes the filter (the build side is
    // the SMALL side of the join by construction)
    val n = urgent.count()
    val m = math.min(BloomMaxBits,
      java.lang.Long.highestOneBit(math.max(1024L, n * BloomBitsPerKey) * 2 - 1))
    val words = urgent
      .select(explode(array(bloomHashes(col("o_orderkey"), m): _*)).as("h"))
      .select(wordIdx(col("h")).as("w"), bitMask(col("h")).as("mask"))
      .groupBy("w").agg(bit_or(col("mask")).as("bm"))
      .collect() // ≤ m/64 rows — bounded by the geometry cap
    val arr = new Array[Long]((m / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    val bw = typedLit(arr)
    val contains = bloomHashes(col("l_orderkey"), m)
      .map(h => element_at(bw, wordIdx(h) + 1).bitwiseAND(bitMask(h)) =!= 0L)
      .reduce(_ && _)
    t(s, dir, "lineitem")
      .filter(contains)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"), 18, 2)).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"), 18, 2)).cast("double").as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** The PLAIN join — the bloom is a physical strategy, so the plain
    * SQL is q113's exact oracle (identity-preservation pattern). */
  val q113Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------ q114 gap-fill (LOCF)

  /** q114: TIME-SERIES GAP-FILL — resample each user's daily activity
    * onto a dense per-user day grid (first..last observed day) and
    * fill missing days with the last observation carried forward
    * (LOCF), emitting the gap days with their carried value: the
    * canonical "regularize an irregular series" step before any
    * time-series model, and the report of silent-dropout windows.
    *
    * Scale shape: the raw stream collapses to (user, day) partials
    * map-side BEFORE any shuffle; the grid explodes bounded by the
    * time horizon (days), never by event volume; one user-partitioned
    * window does the LOCF — users are independent. Values are exact
    * DECIMAL sums so the carried value is engine-identical. */
  def q114GapfillLocf(s: SparkSession, dir: String): DataFrame = {
    val obs = events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"), 18, 2)).as("v"))
    val span = obs.groupBy("user_id").agg(min("day").as("mn"), max("day").as("mx"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("n").isNull)
      .select(col("user_id"), unix_millis(col("day")).as("day_ms"),
        col("fv").cast("double").as("filled_v"))
      .orderBy("user_id", "day_ms")
  }

  val q114Sql: String =
    """WITH obs AS (
      |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS v
      |  FROM events GROUP BY 1, 2
      |), span AS (
      |  SELECT user_id, min(day) AS mn, max(day) AS mx FROM obs GROUP BY 1
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      |  FROM span
      |), j AS (
      |  SELECT g.user_id, g.day, o.n, o.v
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
      |), f AS (
      |  SELECT user_id, day, n,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      |  FROM j
      |)
      |SELECT user_id, epoch_ms(day) AS day_ms, CAST(fv AS DOUBLE) AS filled_v
      |FROM f WHERE n IS NULL ORDER BY user_id, day_ms""".stripMargin

  // ------------------------------------------- q115 RANGE-framed rolling

  /** Rolling horizon: 24h in microseconds (frame offsets inclusive). */
  val RollingHorizonUs: Long = 86400000000L

  /** q115: PEAK ROLLING-24H ACTIVITY — for every event, the count and
    * exact value-sum of the same user's events in the trailing 24
    * hours via a RANGE-framed window (value-based frame — the window
    * feature ROWS frames can't express: peers at distance ≤ horizon,
    * not a fixed row count), then each user's peak with its instant —
    * the rate-limit/abuse sizing query ("what is this user's worst
    * 24h burst").
    *
    * Determinism: the peak row is picked by row_number over (n24
    * DESC, us ASC, event_id ASC) — total order in both engines; peers
    * at the same `us` share the same RANGE frame so the emitted peak
    * values are unique regardless of which peer wins. Scale: one
    * user-partitioned shuffle, range frames stream in ts order per
    * user — no per-row self-join. */
  def q115RollingPeak(s: SparkSession, dir: String): DataFrame = {
    val wr = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-RollingHorizonUs, 0)
    val wp = Window.partitionBy("user_id")
      .orderBy(col("n24").desc, col("us").asc, col("event_id").asc)
    events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        dec(col("value"), 18, 2).as("v"))
      .withColumn("n24", count(lit(1)).over(wr))
      .withColumn("v24", sum(col("v")).over(wr))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n24").as("peak_n24"),
        expr("us div 1000").as("peak_at_ms"),
        col("v24").cast("double").as("peak_v24"))
      .orderBy("user_id")
  }

  val q115Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    CAST(value AS DECIMAL(18,2)) AS v
       |  FROM events
       |), r AS (
       |  SELECT user_id, event_id, us,
       |    count(*) OVER win AS n24, sum(v) OVER win AS v24
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY us
       |    RANGE BETWEEN $RollingHorizonUs PRECEDING AND CURRENT ROW)
       |), p AS (
       |  SELECT user_id, n24, us, v24,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY n24 DESC, us ASC, event_id ASC) AS rn
       |  FROM r
       |)
       |SELECT user_id, n24 AS peak_n24, us // 1000 AS peak_at_ms,
       |  CAST(v24 AS DOUBLE) AS peak_v24
       |FROM p WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------ q116 triangle count

  /** Co-occurrence cell width (15 min) and the repeat threshold an
    * edge needs (≥2 shared cells): one shared cell is coincidence at
    * scale — a dense accidental graph whose triangle count measures
    * nothing (at sf0.1 the 1-hour/1-cell rule yields a 70%-DENSE
    * graph: wedge volume ~n³). Repeated co-occurrence is the real
    * affinity signal AND the sparsifier that keeps the wedge join
    * bounded. */
  val TriBucketUs: Long = 900000000L
  val TriMinCoocc = 2

  /** q116: TRIANGLE COUNT over the user co-occurrence graph (an edge
    * = two users active in ≥ [[TriMinCoocc]] of the same
    * (event_type, 15-min) cells) with the DEGREE-ORDERED
    * ORIENTATION: edges point from the lower (degree, id) endpoint
    * to the higher, so every triangle a≺b≺c is produced by exactly
    * one wedge a→b→c closed by a→c — the standard
    * distributed-triangle discipline that caps wedge explosion at hub
    * nodes (a hub's wedges form only where BOTH neighbors out-rank
    * it, so out-degrees are ~sqrt-bounded; the naive undirected wedge
    * join is quadratic in hub degree).
    *
    * Scale shape: co-occurrence cells collapse by DISTINCT map-side;
    * the pair join runs per-cell (bounded by cell width, the q35
    * banding discipline) and partial-aggregates into edge weights
    * before the threshold; degree is a broadcastable node table; the
    * wedge join and closure are equi-joins on node ids. */
  def q116Triangles(s: SparkSession, dir: String): DataFrame = {
    val g = events(s, dir)
      .select(col("event_type").as("et"),
        expr(s"unix_micros(ts) div $TriBucketUs").as("b"), col("user_id").as("u"))
      .distinct()
    val e0 = g.as("a").join(g.as("b"),
        col("a.et") === col("b.et") && col("a.b") === col("b.b") &&
          col("a.u") < col("b.u"))
      .groupBy(col("a.u").as("x"), col("b.u").as("y"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= TriMinCoocc)
      .select("x", "y")
    val deg = e0.select(col("x").as("node")).unionAll(e0.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val fwd = col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y"))
    val ed = e0
      .join(broadcast(deg.select(col("node").as("x"), col("d").as("dx"))), "x")
      .join(broadcast(deg.select(col("node").as("y"), col("d").as("dy"))), "y")
      .select(when(fwd, col("x")).otherwise(col("y")).as("src"),
        when(fwd, col("y")).otherwise(col("x")).as("dst"))
    val wedge = ed.as("p").join(ed.as("q"), col("p.dst") === col("q.src"))
      .select(col("p.src").as("wa"), col("q.dst").as("wc"))
    val tri = wedge.join(ed.as("r"),
      col("wa") === col("r.src") && col("wc") === col("r.dst"))
    deg.agg(count(lit(1)).as("n_nodes"), max("d").as("max_degree"))
      .crossJoin(e0.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select("n_nodes", "n_edges", "max_degree", "n_triangles")
  }

  val q116Sql: String =
    s"""WITH g AS (
      |  SELECT DISTINCT event_type AS et,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // $TriBucketUs AS b, user_id AS u
      |  FROM events
      |), w AS (
      |  SELECT a.u AS x, b.u AS y, count(*) AS c
      |  FROM g a JOIN g b ON a.et = b.et AND a.b = b.b AND a.u < b.u
      |  GROUP BY 1, 2
      |), e0 AS (
      |  SELECT x, y FROM w WHERE c >= $TriMinCoocc
      |), deg AS (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT x AS node FROM e0 UNION ALL SELECT y AS node FROM e0)
      |  GROUP BY 1
      |), ed AS (
      |  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND x < y) THEN x ELSE y END AS src,
      |         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND x < y) THEN y ELSE x END AS dst
      |  FROM e0 JOIN deg dx ON e0.x = dx.node JOIN deg dy ON e0.y = dy.node
      |), tri AS (
      |  SELECT 1 AS one
      |  FROM ed p JOIN ed q ON p.dst = q.src
      |       JOIN ed r ON p.src = r.src AND q.dst = r.dst
      |)
      |SELECT (SELECT count(*) FROM deg) AS n_nodes,
      |  (SELECT count(*) FROM e0) AS n_edges,
      |  (SELECT max(d) FROM deg) AS max_degree,
      |  (SELECT count(*) FROM tri) AS n_triangles""".stripMargin

  // ------------------------------------------------------- q117 skyline

  /** q117: 2-D SKYLINE (Pareto frontier) over parts — cheapest-price
    * / largest-size non-dominated set (A dominates B iff price ≤ and
    * size ≥ with one strict): the multi-objective "best tradeoffs"
    * query the classic OLAP skyline papers study.
    *
    * Plan: collapse to PRICE LEVELS (groupBy price → max size; pure
    * partial agg), then one running-max sweep over the levels in
    * price order — a part is on the frontier iff it carries its
    * level's max size AND no strictly-cheaper level reaches that
    * size. The sweep runs over DISTINCT PRICES, not parts; at scale
    * that's the frontier-sized relation (and if the price domain
    * itself were huge, a coarse price-bucket pre-prune bounds it —
    * the levels whose bucket is dominated by a cheaper bucket's max
    * never reach the sweep). The frontier is then a broadcast join
    * back against the full relation. The oracle is the dominance
    * NOT EXISTS — a definition, not a plan, so the hash match proves
    * the sweep implements exact dominance semantics including ties
    * (equal (price, size) duplicates all survive; nothing strictly
    * better exists). */
  def q117Skyline(s: SparkSession, dir: String): DataFrame = {
    val lvl = t(s, dir, "part")
      .groupBy(col("p_retailprice").as("price")).agg(max("p_size").as("msize"))
    val w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    val frontier = lvl.withColumn("pm", max("msize").over(w))
      .filter(col("pm").isNull || col("pm") < col("msize"))
      .select(col("price"), col("msize"))
    t(s, dir, "part").join(broadcast(frontier),
        col("p_retailprice") === col("price") && col("p_size") === col("msize"))
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
      .orderBy("p_partkey")
  }

  val q117Sql: String =
    """SELECT p_partkey, p_name, p_retailprice, p_size
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------- q118 fuzzy entity join

  /** q118: BLOCKED FUZZY ENTITY MATCHING — record linkage between a
    * dirty catalog (part names deterministically degraded by vowel
    * removal — the typo/abbreviation stand-in) and the clean part
    * relation: candidates form ONLY within a blocking key (first
    * character), a codegen'd [[graft.functions.JaroWinkler]] scores
    * each candidate pair, and each probe keeps its best match at
    * similarity ≥ [[FuzzyMinSim]] (argmax by rounded score, ties to
    * the smallest key — p_names repeat, so ties are real).
    *
    * Scale shape: two entity-resolution disciplines compose —
    * BLOCKING (candidates form per first-char block, equi-join
    * co-located, never cross-block) and STRING-DEDUP-BEFORE-SCORING
    * (similarity depends only on the names, so the quadratic scoring
    * runs over Σ_b |dirty-vocab_b|·|name-vocab_b| — the catalog's
    * distinct-name vocabulary, not its row count; scores then join
    * back to rows broadcast). Ranking uses the ROUNDED similarity so
    * a last-ulp float divergence can never reorder two engines'
    * rankings; the unrounded threshold never gates (see
    * [[graft.functions.FuzzyOps]]). */
  def q118FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val probes = part.filter(col("p_partkey") % 5 === 0)
      .select(col("p_partkey").as("probe_key"),
        translate(col("p_name"), "aeiou", "").as("dirty"))
    // score DISTINCT STRING PAIRS, not row pairs: similarity depends
    // only on the names, so the quadratic work runs over the distinct
    // name vocabulary per block (64 names here; bounded by catalog
    // vocabulary, not row count, at any SF). The row-level argmax
    // over (sim DESC, p_partkey ASC) decomposes exactly: among names
    // achieving a probe's best score, the winning part is the minimal
    // key of the minimal-key name — so ranking names by
    // (sim DESC, min_key ASC) reproduces the row-pair ranking.
    val names = part.groupBy("p_name").agg(min("p_partkey").as("min_key"))
    val scored = probes.select("dirty").distinct()
      .join(names, substring(col("dirty"), 1, 1) === substring(col("p_name"), 1, 1))
      .withColumn("sim",
        round(graft.functions.FuzzyExprs.jaroWinkler(col("dirty"), col("p_name")), 6))
      .filter(col("sim") >= FuzzyMinSim)
    val w = Window.partitionBy("dirty").orderBy(col("sim").desc, col("min_key").asc)
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("dirty"), col("min_key").as("matched_key"), col("sim"))
    probes.join(broadcast(best), "dirty")
      .select("probe_key", "matched_key", "sim")
      .orderBy("probe_key")
  }

  /** Minimum (rounded) Jaro-Winkler score for a candidate match. */
  val FuzzyMinSim = 0.85

  val q118Sql: String =
    s"""WITH probes AS (
       |  SELECT p_partkey AS probe_key, translate(p_name, 'aeiou', '') AS dirty
       |  FROM part WHERE p_partkey % 5 = 0
       |), cand AS (
       |  SELECT probe_key, p.p_partkey,
       |    round(jaro_winkler_similarity(dirty, p.p_name), 6) AS sim
       |  FROM probes JOIN part p
       |    ON substring(dirty, 1, 1) = substring(p.p_name, 1, 1)
       |), best AS (
       |  SELECT probe_key, p_partkey, sim,
       |    row_number() OVER (PARTITION BY probe_key
       |      ORDER BY sim DESC, p_partkey) AS rn
       |  FROM cand WHERE sim >= $FuzzyMinSim
       |)
       |SELECT probe_key, p_partkey AS matched_key, sim
       |FROM best WHERE rn = 1 ORDER BY probe_key""".stripMargin

  // -------------------------------------------- q119 incremental HLL union

  /** Sketch-vs-exact certification bound (the q52/q80 discipline). */
  val HllRelErr = 0.05

  /** q119: INCREMENTAL DISTINCT-COUNT MAINTENANCE — the materialized-
    * view pattern for "cumulative unique users by day" at 100 TB:
    * each day's arrivals collapse ONCE into a DataSketches HLL
    * sketch (`hll_sketch_agg`, the MV delta — at scale these persist
    * with the partition), and any as-of-day cumulative distinct is a
    * MERGE of per-day sketches (`hll_union_agg` over ≤ horizon rows)
    * — history is never rescanned. The query certifies the estimate
    * against the exact cumulative distinct (first-seen-day counts —
    * computable here because the gate SF is small) and emits the
    * pinned `within_bounds` booleans, the q52 pattern: sketch VALUES
    * are engine-specific, so the oracle checks the exact side and
    * the bound, and a sketch regression flips a boolean. */
  def q119HllIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val daily = e.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    val cum = daily.select(col("day").as("d"))
      .join(daily, col("day") <= col("d"))
      .groupBy("d").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = e.groupBy("user_id").agg(min("day").as("fd"))
      .join(daily.select(col("day").as("d")), col("fd") <= col("d"))
      .groupBy("d").agg(count(lit(1)).as("n_exact"))
    cum.join(exact, "d")
      .select(unix_millis(col("d")).as("day_ms"), col("n_exact"),
        (abs(col("est") - col("n_exact")).cast("double") <=
          lit(HllRelErr) * col("n_exact")).as("within_bounds"))
      .orderBy("day_ms")
  }

  val q119Sql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      |  FROM events
      |), fd AS (
      |  SELECT user_id, min(day) AS fd FROM e GROUP BY 1
      |), days AS (
      |  SELECT DISTINCT day AS d FROM e
      |)
      |SELECT epoch_ms(d) AS day_ms, count(*) AS n_exact, true AS within_bounds
      |FROM days JOIN fd ON fd.fd <= days.d
      |GROUP BY d ORDER BY day_ms""".stripMargin

  // --------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_bloom_join" -> (q113BloomJoin _),
    "q114_gapfill_locf" -> (q114GapfillLocf _),
    "q115_rolling_peak" -> (q115RollingPeak _),
    "q116_triangles" -> (q116Triangles _),
    "q117_skyline" -> (q117Skyline _),
    "q118_fuzzy_join" -> (q118FuzzyJoin _),
    "q119_hll_incremental" -> (q119HllIncremental _)
  )

  val oracle: Map[String, String] = Map(
    "q113_bloom_join" -> q113Sql,
    "q114_gapfill_locf" -> q114Sql,
    "q115_rolling_peak" -> q115Sql,
    "q116_triangles" -> q116Sql,
    "q117_skyline" -> q117Sql,
    "q118_fuzzy_join" -> q118Sql,
    "q119_hll_incremental" -> q119Sql
  )
}
