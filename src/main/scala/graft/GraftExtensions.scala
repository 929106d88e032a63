package graft

import graft.functions.{BloomContains, ByteWindowEnergy, CmsEstimate, DotProduct, FromAvro, JaroWinkler, ToAvro, TokenPolyHash}
import graft.model.SchemaDef
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The canonical plug-in path for the engine's Catalyst extensions:
  * `spark.sql.extensions=graft.GraftExtensions` registers every custom
  * expression at SESSION BUILD time — no imperative
  * `registerFunctions` call needed, and the functions exist in every
  * derived `newSession()`. This is how a cluster deployment (or a
  * Thrift/Connect server whose sessions the engine never sees) gets
  * the graft SQL surface; `GraftSession.getOrCreate` keeps the
  * imperative registration for ad-hoc sessions, delegating to the same
  * definitions so the two paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
}

object GraftExtensions {
  /** Single source of truth for the SQL function surface — used by
    * both the extensions injector and GraftSession.registerFunctions. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - sequential-fold dot product",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("graft_polyhash", "graft_polyhash(tokens) - md5 polynomial rolling hash",
      (exprs: Seq[Expression]) => TokenPolyHash(exprs.head)),
    ("graft_to_avro", "graft_to_avro(struct) - Avro-encode the payload struct",
      (exprs: Seq[Expression]) => ToAvro(exprs.head, SchemaDef.mensagemAvroJson)),
    ("graft_from_avro", "graft_from_avro(bin) - Avro-decode the payload struct",
      (exprs: Seq[Expression]) => FromAvro(exprs.head, SchemaDef.mensagemAvroJson)),
    ("graft_cms_estimate", "graft_cms_estimate(sketch, key) - CMS estimated count for key",
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))),
    ("graft_bloom_contains", "graft_bloom_contains(bloom, key) - Bloom membership for a long key",
      (exprs: Seq[Expression]) => BloomContains(exprs(0), exprs(1))),
    ("graft_win_energy", "graft_win_energy(bin, start, len) - sum of squared (byte-128) over a slice",
      (exprs: Seq[Expression]) => ByteWindowEnergy(exprs(0), exprs(1), exprs(2))),
    ("graft_jaro_winkler", "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
}
