package graft.sources

/** Kafka offset-range planning for the consumer's "seek to end − N"
  * scan (reference: aplicacoes/ConsumidorAvro.java:163-180, duplicated
  * in ConsumidorJson.java:235-252): each assigned partition starts at
  * `max(beginningOffset, endOffset − ceil(target / numPartitions))`.
  *
  * Pure functions (no broker I/O) so the logic is unit-testable in
  * this offline environment; the Spark Kafka source consumes the
  * result via its `startingOffsets` per-partition JSON option. The
  * reads themselves are then one Spark task per topic-partition —
  * the engine's analogue of the reference's thread-per-partition.
  */
object KafkaOffsets {

  /** Per-partition start offsets for a tail scan of ~`target` total
    * records. Mirrors the reference arithmetic exactly, including the
    * ceiling division and the beginning-offset clamp. */
  def seekEndMinusN(
      beginning: Map[Int, Long], end: Map[Int, Long], target: Long): Map[Int, Long] = {
    require(target >= 0, s"target must be >= 0, got $target")
    val parts = end.size.toLong
    if (parts == 0) Map.empty
    else {
      val perPart = (target + parts - 1) / parts // ceil(target / partitions)
      end.map { case (p, endOff) =>
        p -> math.max(beginning.getOrElse(p, 0L), endOff - perPart)
      }
    }
  }

  /** The Spark Kafka source `startingOffsets` JSON for one topic:
    * {"topic":{"0":off0,"1":off1,...}}. */
  def startingOffsetsJson(topic: String, offsets: Map[Int, Long]): String = {
    val inner = offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString(",")
    s"""{"$topic":{$inner}}"""
  }

  /** Security/auth passthrough mirroring the reference's client config
    * (ConfiguracaoKafka.java:133-139 and :169-175: SASL_SSL + PLAIN
    * with a JAAS line built from CLUSTER_API_KEY/CLUSTER_API_SECRET):
    * the same env names produce the same client properties, prefixed
    * `kafka.` for the Spark source/sink passthrough. Protocol and
    * mechanism are overridable (KAFKA_SECURITY_PROTOCOL /
    * KAFKA_SASL_MECHANISM) for non-Confluent clusters; no credentials
    * in the env → empty map (plaintext broker, the offline default). */
  def securityOptions(env: Map[String, String] = sys.env): Map[String, String] =
    (env.get("CLUSTER_API_KEY"), env.get("CLUSTER_API_SECRET")) match {
      case (Some(key), Some(secret)) if key.nonEmpty && secret.nonEmpty => Map(
        "kafka.security.protocol" -> env.getOrElse("KAFKA_SECURITY_PROTOCOL", "SASL_SSL"),
        "kafka.sasl.mechanism" -> env.getOrElse("KAFKA_SASL_MECHANISM", "PLAIN"),
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
            s"username='$key' password='$secret';"))
      case _ => Map.empty
    }

  /** Spark Kafka SINK options carrying the reference producer's tuned
    * physical knobs (ConfiguracaoKafka.java:140-148) — batching,
    * lingering, buffer sizing, compression, acks — plus the security
    * passthrough, as `kafka.*` options. Pure builder (no broker needed
    * offline). */
  def producerOptions(
      topic: String, compression: String = "lz4", acks: String = "1",
      batchBytes: Int = 32768, lingerMs: Int = 10,
      bufferBytes: Long = 64L * 1024 * 1024, maxRequestBytes: Int = 3 * 1024 * 1024,
      env: Map[String, String] = sys.env)
      : Map[String, String] = Map(
    "topic" -> topic,
    "kafka.acks" -> acks,
    "kafka.compression.type" -> compression,
    "kafka.batch.size" -> batchBytes.toString,
    "kafka.linger.ms" -> lingerMs.toString,
    "kafka.buffer.memory" -> bufferBytes.toString,
    "kafka.max.request.size" -> maxRequestBytes.toString) ++ securityOptions(env)

  /** Reader options for a tail scan: per-partition starts plus
    * `minPartitions` so Spark splits hot partitions into more tasks
    * than topic partitions when asked (scale lever the reference's
    * fixed thread-per-partition model lacks), plus the security
    * passthrough. */
  def tailScanOptions(
      topic: String, beginning: Map[Int, Long], end: Map[Int, Long],
      target: Long, minPartitions: Option[Int] = None,
      env: Map[String, String] = sys.env): Map[String, String] = {
    val base = Map(
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsetsJson(topic, seekEndMinusN(beginning, end, target)),
      "endingOffsets" -> "latest")
    base ++ minPartitions.map(n => "minPartitions" -> n.toString) ++ securityOptions(env)
  }
}
