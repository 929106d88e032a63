package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-resilient aggregation — the salting idiom for hot grouping
  * keys (SURVEY.md §7.4: "skewed keys → salting or AQE skew-join").
  *
  * AQE splits skewed SHUFFLE PARTITIONS, but a single hot KEY still
  * lands its entire partial-aggregate stream on one reducer. Salting
  * splits the key itself: phase 1 aggregates on (key, salt) — spreading
  * one hot key over `salts` reducers — phase 2 merges the partials on
  * the key alone. Works for any algebraic aggregate (here: count/sum
  * pairs, the engine's metric counters).
  *
  * The salt derives from a uniform hash of a row-identity column, not
  * rand(): deterministic → retry-safe tasks and reproducible tests.
  */
object SkewOps {

  /** Two-phase salted count+sum grouped by `keys`.
    * @param idCol any column (or combination) that spreads rows
    *              uniformly — used only to derive the salt. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      idCol: Column, salts: Int = 32): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt", pmod(xxhash64(idCol), lit(salts.toLong)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }

  /** Skew-resilient equi-join that salts ONLY detected hot keys: a
    * cheap frequency pass over the probe keys (partial aggregation
    * collapses each hot key map-side, so the sketch itself cannot
    * skew) finds keys above `hotRowThreshold`; hot probe rows get a
    * uniform hash salt, hot build rows replicate once per salt, and
    * EVERY cold row keeps salt 0 — one equi-join on (key, salt) serves
    * both populations. Semantically identical to
    * `probe.join(build, probeKey === buildKey)` when `buildKey` is
    * unique on the build side (each probe row meets exactly one
    * replica). This is the manual fallback for the case AQE skew-join
    * cannot fix: a single hot KEY inside one shuffle partition whose
    * matching build rows must co-locate.
    *
    * Cost model (the round-2 version replicated the ENTIRE build side
    * `salts`×): build amplification = |hot build rows| × salts +
    * |cold build rows| × 1 — it tracks the number of HOT keys, which
    * is small by definition. Probe ships 1×; the hot-key set
    * broadcasts (≤ |probe| / hotRowThreshold rows by construction,
    * and the identical sketch subplan on both sides reuses one
    * broadcast exchange). */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      idCol: Column, salts: Int = 16,
      hotRowThreshold: Long = 100000L,
      precomputedHot: Option[DataFrame] = None): DataFrame = {
    val hot = precomputedHot.getOrElse(hotKeys(probe, probeKey, hotRowThreshold))
    val sp = saltedProbeSide(probe, probeKey, idCol, salts, hot)
    val sb = saltedBuildSide(build, buildKey, salts, hot)
    sp.join(sb, sp("__salt") === sb("__salt") && col(probeKey) === col(buildKey))
      .drop("__salt")
  }

  /** Probe keys with more than `hotRowThreshold` rows — the salting
    * candidates. Bounded by |probe| / threshold rows, so it broadcasts.
    * PUBLIC so a caller can profile once, cache the (tiny) hot-key
    * set via PlanCache/localCheckpoint, and pass it back through
    * `saltedJoin(precomputedHot = ...)` — without that, every
    * invocation re-profiles the probe side (round-9 verdict: q51
    * re-ran the frequency pass per bench pass). */
  def hotKeys(probe: DataFrame, probeKey: String, hotRowThreshold: Long): DataFrame =
    probe.groupBy(col(probeKey).as("__hk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotRowThreshold)
      .select("__hk")

  private def saltedProbeSide(probe: DataFrame, probeKey: String,
      idCol: Column, salts: Int, hotDf: DataFrame): DataFrame = {
    require(salts > 0)
    val hot = broadcast(hotDf)
    probe.join(hot, probe(probeKey) === hot("__hk"), "left")
      .withColumn("__salt",
        when(col("__hk").isNotNull, pmod(xxhash64(idCol), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hk")
  }

  /** Build side with per-row salt replication: hot rows explode into
    * `salts` replicas, cold rows stay single with salt 0. Exposed
    * package-private so specs can assert the amplification bound. */
  private[graft] def saltedBuildSide(build: DataFrame, buildKey: String,
      salts: Int, hotDf: DataFrame): DataFrame = {
    require(salts > 0)
    val hot = broadcast(hotDf)
    build.join(hot, build(buildKey) === hot("__hk"), "left")
      .withColumn("__salt",
        explode(when(col("__hk").isNotNull,
            array((0 until salts).map(s => lit(s.toLong)): _*))
          .otherwise(array(lit(0L)))))
      .drop("__hk")
  }
}
