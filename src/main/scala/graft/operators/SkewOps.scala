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

  /** Skew-resilient equi-join: the PROBE side's rows are salted by a
    * uniform hash of a row-identity column, the BUILD side is
    * replicated once per salt, and the join key becomes (key, salt) —
    * so a hot probe key spreads over `salts` reducers instead of
    * hammering one. Semantically identical to
    * `probe.join(build, probeKey === buildKey)` when `buildKey` is
    * unique on the build side (each probe row meets exactly one
    * replica). This is the manual fallback for the case AQE skew-join
    * cannot fix: a single hot KEY inside one shuffle partition whose
    * matching build rows must co-locate.
    *
    * Cost model: build side ships `salts`× (bounded, choose salts ~
    * hot-key fan-out / target partition size); probe side ships 1×. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      idCol: Column, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val sp = probe.withColumn("__salt", pmod(xxhash64(idCol), lit(salts.toLong)))
    val sb = build.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    sp.join(sb, sp("__salt") === sb("__salt") && col(probeKey) === col(buildKey))
      .drop("__salt")
  }
}
