package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real `format("kafka")` source/sink wiring — the reference's primary
  * dataflow (reference: aplicacoes/ProdutorAvro.java:69-95 send loop to
  * `carga-sandbox-avro`; ConsumidorAvro.java:57-121 consumer poll).
  *
  * Flag-gated: `graft.Main` switches from the parquet-dir offline
  * analogue to these paths when KAFKA_BOOTSTRAP_SERVERS is set (the
  * reference's own env name, util/ConfiguracaoKafka.java:19). This
  * container ships no Kafka connector jars and no broker, so the specs
  * assert CONSTRUCTION: the reader/writer reaches Spark's data-source
  * provider lookup carrying exactly the tuned option surface
  * (KafkaOffsets.producerOptions / tailScanOptions), and the
  * record-shaping projections execute offline.
  */
object KafkaIO {

  /** The reference's topic names (ProdutorAvro.java:22, ProdutorJson
    * equivalent). */
  def topicoMensagens(avro: Boolean): String =
    if (avro) "carga-sandbox-avro" else "carga-sandbox-json"

  /** The reference's per-app RESULTS topic (ProdutorAvro.java:23,
    * ConsumidorAvro.java:28 and the json twins): each of the four
    * pipelines publishes its final metrics report to its own topic. */
  def topicoResultados(avro: Boolean, producer: Boolean): String =
    s"resultados-carga-sandbox-${if (avro) "avro" else "json"}-" +
      (if (producer) "producer" else "consumer")

  /** The record key the reference sends its report under
    * (ProdutorAvro.java:130: "metricas-produtor-avro"). */
  def reportKey(avro: Boolean, producer: Boolean): String =
    s"metricas-${if (producer) "produtor" else "consumidor"}-" +
      (if (avro) "avro" else "json")

  /** Publish the one-row metrics report as a single JSON record to
    * the per-app results topic — the reference's enviarMetricas
    * (ProdutorAvro.java:122-139: report JSON keyed by app id, plain
    * producer, fire-and-forget semantics). The report is a single
    * aggregated row, so the driver-side collect is O(1). */
  def publishReport(report: DataFrame, brokers: String, avro: Boolean,
      producer: Boolean): Unit = {
    val spark = report.sparkSession
    import spark.implicits._
    val json = report.toJSON.collect().mkString("\n")
    Seq((reportKey(avro, producer), json)).toDF("key", "value")
      .select(col("key").cast("binary"), col("value").cast("binary"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      // same auth surface as the data-path writes: against a secured
      // cluster (the reference's SASL_SSL deployment) the metrics
      // publish must not be the one unauthenticated call that throws
      // AFTER the pipeline succeeded
      .options(KafkaOffsets.securityOptions())
      .option("topic", topicoResultados(avro, producer))
      .save()
  }

  /** The produce/consume switch: Some(brokers) → live Kafka paths. */
  def brokersFromEnv(env: Map[String, String] = sys.env): Option[String] =
    env.get("KAFKA_BOOTSTRAP_SERVERS").map(_.trim).filter(_.nonEmpty)

  /** Shape the engine's message frame (chave, particao, valor) into the
    * Kafka sink contract: key/value binary plus an explicit partition —
    * the reference pins the round-robin partition on the ProducerRecord
    * (ProdutorAvro.java:70), not via the default partitioner. Pure
    * projection: executable (and spec-asserted) offline. */
  def toSinkFrame(raw: DataFrame): DataFrame =
    raw.select(
      col("chave").cast("binary").as("key"),
      col("valor").cast("binary").as("value"),
      col("particao").cast("int").as("partition"))

  /** Batch producer write with the reference's tuned physical knobs
    * (batching, linger, buffer, compression, acks — as kafka.*
    * passthroughs). One Spark task per input partition feeds the
    * async producer, replacing the reference's single-threaded send
    * loop with a distributed one. */
  def writeBatch(sinkFrame: DataFrame, brokers: String, topic: String,
      compression: String = "lz4"): Unit =
    sinkFrame.write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .options(KafkaOffsets.producerOptions(topic, compression))
      .save()

  /** Batch tail scan: seek end−N per partition via the per-partition
    * startingOffsets JSON (offsets obtained from the broker's admin
    * API at runtime; the arithmetic is KafkaOffsets.seekEndMinusN —
    * the reference's ConsumidorAvro.java:163-180). One Spark task per
    * topic-partition (or more with minPartitions) replaces the
    * reference's thread-per-partition. */
  def readTail(s: SparkSession, brokers: String, topic: String,
      beginning: Map[Int, Long], end: Map[Int, Long], target: Long,
      minPartitions: Option[Int] = None): DataFrame =
    s.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .options(KafkaOffsets.tailScanOptions(topic, beginning, end, target, minPartitions))
      .load()

  /** Batch full scan (earliest → latest) — the consume path Main uses
    * when no explicit offsets are planned. */
  def readAll(s: SparkSession, brokers: String, topic: String): DataFrame =
    s.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Streaming source from latest — the open-ended poll loop; pair
    * with StreamOps.IdleStop for the reference's inactivity stop. */
  def readLatestStream(s: SparkSession, brokers: String, topic: String): DataFrame =
    s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()

  /** Shape a Kafka source frame back into the engine's consume input
    * (particao, valor) — the inverse of [[toSinkFrame]]; downstream
    * decode/metrics are identical to the parquet path. */
  def fromSourceFrame(kafka: DataFrame): DataFrame =
    kafka.select(
      col("partition").as("particao"),
      col("value").as("valor"),
      unix_millis(col("timestamp")).as("timestamp"))
}
