package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` plug-in path: the
  * engine's SQL surface must exist in a session built ONLY from that
  * config (no imperative registerFunctions call) — and, unlike
  * temp-function registration, survive into derived `newSession()`s
  * (the multi-session server scenario). */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("ext-test", cores = 2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("extensions inject the SQL surface at session build time") {
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    val h = spark.sql("SELECT graft_polyhash(array('a', 'b')) AS h").head().getLong(0)
    assert(h > 0)
    // the round-6 sketch/media expressions ride the same injector
    val e = spark.sql("SELECT graft_win_energy(X'80', 0L, 1) AS e").head().getLong(0)
    assert(e == 0L, "0x80 is exactly the 128 midpoint: zero energy")
    assert(spark.catalog.functionExists("graft_cms_estimate"))
    assert(spark.catalog.functionExists("graft_bloom_contains"))
  }

  test("derived sessions inherit the injected functions") {
    // temp-function registration is per-session state; injected
    // functions come from the session builder and survive newSession
    val derived = spark.newSession()
    val rt = derived.sql(
      """SELECT graft_from_avro(graft_to_avro(named_struct(
        |  'id', 'x', 'timestamp', 1L, 'sequencia', 7L,
        |  'dados', array(named_struct('indice', 0, 'texto', 't', 'numero', 1.5D,
        |                              'timestamp', 3L, 'uuid', 'u')),
        |  'versao', '1.0'))).sequencia AS seq""".stripMargin)
      .head().getLong(0)
    assert(rt == 7L)
  }
}
