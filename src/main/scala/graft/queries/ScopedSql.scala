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
    * Token rewrite is word-bounded AND segment-aware: single-quoted
    * string literals, backtick-quoted identifiers, `--` line comments
    * and bracketed comments are left untouched (round-10 ADVICE — a
    * blind whole-text replaceAll would silently corrupt a table name
    * occurring inside a literal or comment). Column names that embed a
    * table name (none do in this suite) would still need renaming, not
    * regex care. */
  def run(s: SparkSession, dir: String, sql: String,
      tables: (String, DataFrame)*): DataFrame =
    s.sql(rewrite(s, dir, sql, tables: _*))

  /** As [[run]], for parameterized text (named-marker `args` bind at
    * parse time, exactly like the unscoped call). */
  def runWithArgs(s: SparkSession, dir: String, sql: String,
      args: Map[String, Any], tables: (String, DataFrame)*): DataFrame =
    s.sql(rewrite(s, dir, sql, tables: _*), args)

  /** Segments the rewrite must never enter: single-quoted literals
    * (with both `''` and backslash escapes — Spark SQL accepts
    * 'it\'s' by default, and a mis-terminated span would let a table
    * token after the \' be rewritten inside the literal — round-11
    * ADVICE), backtick identifiers, `--` line comments, bracketed
    * comments. */
  private val ProtectedSegment =
    "('(?:[^'\\\\]|''|\\\\.)*')|(`[^`]*`)|(--[^\\n]*)|(/\\*[\\s\\S]*?\\*/)".r

  /** Word-bounded replace of `name` → `scoped`, skipping protected
    * segments. */
  private[graft] def rewriteToken(sql: String, name: String,
      scoped: String): String = {
    val pat = ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
    val rep = scala.util.matching.Regex.quoteReplacement(scoped)
    val sb = new StringBuilder
    var last = 0
    ProtectedSegment.findAllMatchIn(sql).foreach { m =>
      sb.append(pat.replaceAllIn(sql.substring(last, m.start), rep))
      sb.append(m.matched)
      last = m.end
    }
    sb.append(pat.replaceAllIn(sql.substring(last), rep))
    sb.toString
  }

  private def rewrite(s: SparkSession, dir: String, sql: String,
      tables: (String, DataFrame)*): String = {
    val t = tag(dir)
    tables.foldLeft(sql) { case (q, (name, df)) =>
      val scoped = s"${name}_$t"
      df.createOrReplaceTempView(scoped)
      rewriteToken(q, name, scoped)
    }
  }
}
