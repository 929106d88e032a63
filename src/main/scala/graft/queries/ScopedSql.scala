package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dir-scoped temp-view registration for the spark.sql-surface
  * queries.
  *
  * The SQL-surface entries (q10 via SQL, q25, q133, q134, q143, q159,
  * q161, q162, q164, q166) run shared ANSI text through `spark.sql`
  * over temp views. Registering those views under BARE names
  * ('orders', 'lineitem') makes the binding a session-global mutable:
  * interleaving two fixture dirs in one session can rebind a
  * query's tables to the wrong dir (classic-mode `spark.sql` analyzes
  * eagerly, which narrows the window to the register→sql gap — but a
  * concurrent caller, or a future lazy-analysis mode, still races).
  * Round-9 ADVICE: scope the names by dir instead.
  *
  * [[run]] registers each table as `<name>_g<dirhash>` and rewrites
  * the bare table tokens in the SQL to the scoped names, so two dirs
  * get disjoint view namespaces and can never cross-bind. The
  * UNSCOPED text stays the artifact both engines share (the DuckDB
  * oracle runs it verbatim); only the Spark-side execution aliases
  * the names.
  */
object ScopedSql {

  /** Stable per-dir suffix, hex of the dir's hashCode ('n' for the
    * sign so the identifier stays bare-word). */
  def tag(dir: String): String = {
    val h = dir.hashCode
    val hex = java.lang.Integer.toHexString(math.abs(h))
    if (h < 0) s"gn$hex" else s"g$hex"
  }

  /** Register each (name → df) under its dir-scoped name and run
    * `sql` with every bare `name` token rewritten to the scoped name.
    * Token rewrite is word-bounded, so column names that embed a
    * table name (none do in this suite) would need renaming, not
    * regex care. */
  def run(s: SparkSession, dir: String, sql: String,
      tables: (String, DataFrame)*): DataFrame =
    s.sql(rewrite(s, dir, sql, tables: _*))

  /** As [[run]], for parameterized text (named-marker `args` bind at
    * parse time, exactly like the unscoped call). */
  def runWithArgs(s: SparkSession, dir: String, sql: String,
      args: Map[String, Any], tables: (String, DataFrame)*): DataFrame =
    s.sql(rewrite(s, dir, sql, tables: _*), args)

  private def rewrite(s: SparkSession, dir: String, sql: String,
      tables: (String, DataFrame)*): String = {
    val t = tag(dir)
    tables.foldLeft(sql) { case (q, (name, df)) =>
      val scoped = s"${name}_$t"
      df.createOrReplaceTempView(scoped)
      q.replaceAll("\\b" + java.util.regex.Pattern.quote(name) + "\\b", scoped)
    }
  }
}
