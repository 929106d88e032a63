package graft.sources

import graft.GraftSession
import graft.model.EngineConf

/** Materializes the deterministic `messages` fixture the oracle
  * queries read (FIXTURES.md §A): 5000 msgs x 1 KB (5 registros each),
  * 18 partitions, seed 42. Both the Spark queries and the DuckDB
  * oracle read the SAME parquet file, so the correctness check is
  * purely about query semantics, not generation.
  *
  * Run: sbt "runMain graft.sources.GenFixtures /root/repo/fixtures"
  */
object GenFixtures {
  val FixtureConf: EngineConf = EngineConf(
    totalMensagens = 5000, tamanhoMensagemKB = 1, numParticoes = 18,
    warmupMensagens = 0, seed = 42)

  /** Fixture root, configurable so a relocated repo / alternate fixture
    * set works without recompiling: -Dgraft.fixtures.dir beats
    * $GRAFT_FIXTURES_DIR beats the committed default. Read once at
    * class init — the oracle SQL strings interpolate the same value. */
  val FixturesRoot: String =
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse("/root/repo/fixtures")

  /** Canonical committed location, used by the messages queries. */
  val MessagesPath = s"$FixturesRoot/messages.parquet"

  /** Media fixture sizing (see MultimodalOps GRFT container). */
  val MediaRows = 300L

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(FixturesRoot)
    val spark = GraftSession.getOrCreate("graft-fixtures")
    try {
      Generator.messages(spark, FixtureConf)
        .coalesce(1)
        .sortWithinPartitions("sequencia")
        .write.mode("overwrite").parquet(s"$out/messages_dir")
      graft.llmops.MultimodalOps.generate(spark, MediaRows, FixtureConf.seed)
        .coalesce(1)
        .sortWithinPartitions("media_id")
        .write.mode("overwrite").parquet(s"$out/media_dir")
    } finally spark.stop()
    singleFile(out, "messages")
    singleFile(out, "media")
  }

  /** Collapse a one-part parquet dir to a single file so DuckDB's
    * read_parquet('...parquet') is trivial. */
  private def singleFile(out: String, name: String): Unit = {
    val dir = new java.io.File(s"$out/${name}_dir")
    val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$out/$name.parquet")
    if (dst.exists()) dst.delete()
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dir.listFiles().foreach(_.delete()); dir.delete()
    println(s"wrote $dst (${dst.length()} bytes)")
  }
}
