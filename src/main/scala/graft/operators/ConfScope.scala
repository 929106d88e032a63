package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped override of `spark.sql.shuffle.partitions`.
  *
  * SINGLE-THREADED CONTRACT (the reason this helper exists as one
  * loudly-documented site instead of two quiet `conf.set` calls): the
  * setting is SESSION-scoped, so any query planned CONCURRENTLY on the
  * same SparkSession during the block would silently execute its
  * shuffles at the scoped width. That is safe here because the
  * engine's entry points (bench, verify, the CLI) run queries
  * sequentially on their session; a caller embedding graft in a
  * multi-tenant / concurrent-query session must isolate first with
  * `session.newSession()` (cheap: shares the SparkContext, forks the
  * conf). The alternative — plan-scoped `repartition` on every
  * intermediate frame of an iterative loop — cannot reach the shuffles
  * Catalyst introduces inside joins/aggregations, which is exactly
  * what the scoped width needs to size.
  *
  * The restore path detects contract violations: if the conf no longer
  * holds the scoped value, another thread mutated it mid-block; the
  * helper restores the original value anyway and warns on stderr
  * (throwing from a finally would mask the body's own failure).
  */
object ConfScope {
  private val Key = "spark.sql.shuffle.partitions"

  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.getOption(Key)
    s.conf.set(Key, n.toString)
    try body
    finally {
      val now = s.conf.getOption(Key)
      if (!now.contains(n.toString))
        System.err.println(
          s"[graft] ConfScope: $Key changed to $now inside a scoped block " +
            s"(expected $n) — a concurrent query mutated the session conf; " +
            "isolate with session.newSession() (see ConfScope scaladoc)")
      prev match {
        case Some(v) => s.conf.set(Key, v)
        case None => s.conf.unset(Key)
      }
    }
  }
}
