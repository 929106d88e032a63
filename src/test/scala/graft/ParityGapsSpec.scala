package graft

import graft.model.EngineConf
import graft.operators.Metrics
import graft.sources.Generator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Documents the reference's known defects the engine does NOT
  * replicate (SURVEY.md §2.1 "known reference defects"), and the typed
  * aggregation parity path. */
class ParityGapsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val conf = EngineConf(totalMensagens = 500, tamanhoMensagemKB = 1, seed = 42)

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("parity-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("(a) Avro TRANSPORTE mode works — the reference's would ClassCastException") {
    // ConsumidorAvro.java:90-93 casts MensagemCarga to byte[] in byte
    // mode and admits it doesn't work; our transport mode reads the
    // binary column directly and never decodes
    val tmp = java.nio.file.Files.createTempDirectory("graft_parity_").toString
    Main.produce(spark, conf, tmp, avro = true).collect()
    val report = Main.consume(spark, conf.copy(benchMode = "TRANSPORTE"), tmp, avro = true)
      .collect().head
    assert(report.getAs[Long]("totalMensagens") == conf.totalMensagens)
    assert(report.getAs[Long]("totalBytes") > 0)
  }

  test("(b) counters are race-free by construction: typed Aggregator == column aggs") {
    // the reference mutates shared long[] across threads unsynchronized
    // (ConsumidorAvro.java:48,97); both engine paths are partition-local
    // reduce + merge, and they agree exactly
    implicit val obsEnc: org.apache.spark.sql.Encoder[Metrics.Obs] =
      org.apache.spark.sql.Encoders.product[Metrics.Obs]
    val msgs = Generator.messages(spark, conf)
    val colRow = msgs.agg(
      Metrics.counterAggs(col("bytes_avro"), col("sucesso")).head,
      Metrics.counterAggs(col("bytes_avro"), col("sucesso")).tail: _*).head()
    val typed = msgs.select(col("bytes_avro").as("bytes"), col("sucesso"))
      .as[Metrics.Obs]
      .select(Metrics.CounterAggregator.toColumn).head()
    assert(typed.total == colRow.getAs[Long]("totalMensagens"))
    assert(typed.sucesso == colRow.getAs[Long]("mensagensSucesso"))
    assert(typed.erro == colRow.getAs[Long]("mensagensComErro"))
    assert(typed.bytes == colRow.getAs[Long]("totalBytes"))
  }

  test("(c)(d) config surface: documented env names honored, no phantom MICRO mode") {
    // .env.template advertises MICRO but no code implements it; the
    // README's NUM_MENSAGENS is not what the code reads — the engine
    // honors the CODE's names (TOTAL_MENSAGENS etc.)
    val env = Map("TOTAL_MENSAGENS" -> "123", "TAMANHO_MENSAGEM_KB" -> "25",
      "NUM_PARTICOES" -> "9", "BENCH_MODE" -> "TRANSPORTE", "NUM_MENSAGENS" -> "999")
    val c = EngineConf.fromEnv(env)
    assert(c.totalMensagens == 123 && c.tamanhoMensagemKB == 25)
    assert(c.numParticoes == 9 && c.consumerThreads == 9) // threads default = partitions
    assert(c.benchMode == "TRANSPORTE")
    assert(c.totalMensagens != 999, "README's NUM_MENSAGENS must NOT be honored")
  }

  test("TRANSPORTE physical plan contains no deserialization at all") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_parity2_").toString
    Main.produce(spark, conf, tmp, avro = true).collect()
    val df = Main.consume(spark, conf.copy(benchMode = "TRANSPORTE"), tmp, avro = true)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("fromavro") && !plan.contains("from_json"),
      s"transport mode must not parse:\n$plan")
  }
}
