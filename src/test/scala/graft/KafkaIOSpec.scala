package graft

import graft.sources.{Generator, KafkaIO, KafkaOffsets}
import graft.model.EngineConf
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Kafka wiring assertions for an offline container: no connector jars
  * and no broker exist here, so execution is impossible — instead the
  * specs pin (a) the record-shaping projections, which run fully
  * offline, and (b) that the real `format("kafka")` path is reached:
  * load() must fail at Spark's DATA-SOURCE PROVIDER LOOKUP (proving the
  * reader was constructed and resolved), not at option building. */
class KafkaIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val conf = EngineConf(totalMensagens = 60, tamanhoMensagemKB = 1,
    numParticoes = 6, seed = 42)

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("kafkaio-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("sink frame carries the Kafka contract: binary key/value + pinned partition") {
    val raw = Generator.rawAvro(Generator.messages(spark, conf))
    val sink = KafkaIO.toSinkFrame(raw)
    assert(sink.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("key", "binary"), ("value", "binary"), ("partition", "int")))
    val rows = sink.collect()
    assert(rows.length == conf.totalMensagens)
    // the explicit (i-1)%P partitioner must survive the projection
    assert(rows.map(_.getAs[Int]("partition")).toSet == (0 until conf.numParticoes).toSet)
  }

  test("flag gating: no KAFKA_BOOTSTRAP_SERVERS -> None, set -> Some") {
    assert(KafkaIO.brokersFromEnv(Map.empty).isEmpty)
    assert(KafkaIO.brokersFromEnv(Map("KAFKA_BOOTSTRAP_SERVERS" -> " ")).isEmpty)
    assert(KafkaIO.brokersFromEnv(Map("KAFKA_BOOTSTRAP_SERVERS" -> "b:9092"))
      .contains("b:9092"))
  }

  test("reference topic names per format") {
    assert(KafkaIO.topicoMensagens(avro = true) == "carga-sandbox-avro")
    assert(KafkaIO.topicoMensagens(avro = false) == "carga-sandbox-json")
  }

  test("batch tail read reaches the kafka provider lookup with planned offsets") {
    val begin = Map(0 -> 0L, 1 -> 0L)
    val end = Map(0 -> 100L, 1 -> 90L)
    val e = intercept[Exception] {
      KafkaIO.readTail(spark, "broker:9092", "carga-sandbox-avro", begin, end, 50L).collect()
    }
    // the failure must be the MISSING PROVIDER (construction reached
    // DataSource resolution), not an option/validation error upstream
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka provider-lookup failure, got: $e")
    // and the offsets it would have carried are the reference's seek
    // end-N arithmetic
    assert(KafkaOffsets.tailScanOptions("carga-sandbox-avro", begin, end, 50L)(
      "startingOffsets") == """{"carga-sandbox-avro":{"0":75,"1":65}}""")
  }

  test("producer write reaches the kafka provider lookup with tuned options") {
    val raw = Generator.rawAvro(Generator.messages(spark, conf))
    val e = intercept[Exception] {
      KafkaIO.writeBatch(KafkaIO.toSinkFrame(raw), "broker:9092", "carga-sandbox-avro")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka provider-lookup failure, got: $e")
    val opts = KafkaOffsets.producerOptions("carga-sandbox-avro")
    assert(opts("kafka.batch.size") == "32768" && opts("kafka.linger.ms") == "10" &&
      opts("kafka.compression.type") == "lz4" && opts("kafka.acks") == "1")
  }

  test("report publication targets the reference's per-app results topics") {
    // topic/key naming parity (reference ProdutorAvro.java:23,130 and
    // the consumer/json twins)
    assert(KafkaIO.topicoResultados(avro = true, producer = true) ==
      "resultados-carga-sandbox-avro-producer")
    assert(KafkaIO.topicoResultados(avro = true, producer = false) ==
      "resultados-carga-sandbox-avro-consumer")
    assert(KafkaIO.topicoResultados(avro = false, producer = true) ==
      "resultados-carga-sandbox-json-producer")
    assert(KafkaIO.reportKey(avro = true, producer = true) == "metricas-produtor-avro")
    assert(KafkaIO.reportKey(avro = false, producer = false) == "metricas-consumidor-json")
    // construction-asserted like the data paths: the write must reach
    // Spark's kafka provider lookup (no connector jar here)
    val s = spark
    import s.implicits._
    val report = Seq((1900L, 1881L)).toDF("totalMensagens", "mensagensSucesso")
    val e = intercept[Exception] {
      KafkaIO.publishReport(report, "broker:9092", avro = true, producer = true)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka provider-lookup failure, got: $e")
  }

  test("security passthrough mirrors the reference's SASL client config") {
    // the reference builds SASL_SSL/PLAIN from CLUSTER_API_KEY/SECRET
    // (ConfiguracaoKafka.java:133-139); same env names, same JAAS line
    val env = Map("CLUSTER_API_KEY" -> "AK", "CLUSTER_API_SECRET" -> "SC")
    val sec = KafkaOffsets.securityOptions(env)
    assert(sec("kafka.security.protocol") == "SASL_SSL")
    assert(sec("kafka.sasl.mechanism") == "PLAIN")
    assert(sec("kafka.sasl.jaas.config") ==
      "org.apache.kafka.common.security.plain.PlainLoginModule required " +
        "username='AK' password='SC';")
    // overridable for non-Confluent clusters
    assert(KafkaOffsets.securityOptions(env +
      ("KAFKA_SECURITY_PROTOCOL" -> "SASL_PLAINTEXT"))("kafka.security.protocol")
      == "SASL_PLAINTEXT")
    // no credentials -> plaintext (no security options at all)
    assert(KafkaOffsets.securityOptions(Map.empty).isEmpty)
    // and both option builders carry the passthrough
    assert(KafkaOffsets.producerOptions("t", env = env)
      .contains("kafka.sasl.jaas.config"))
    assert(KafkaOffsets.tailScanOptions("t", Map(0 -> 0L), Map(0 -> 10L), 5L, env = env)
      .contains("kafka.sasl.jaas.config"))
  }

  test("streaming source constructs against the kafka provider") {
    val e = intercept[Exception] {
      KafkaIO.readLatestStream(spark, "broker:9092", "carga-sandbox-avro")
        .writeStream.format("noop").start()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka provider-lookup failure, got: $e")
  }
}
