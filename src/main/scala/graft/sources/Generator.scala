package graft.sources

import graft.functions.AvroSerde
import graft.functions.GraftFunctions._
import graft.model.{EngineConf, SchemaDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Distributed, deterministic message generator — the Spark-native
  * re-expression of the reference's driver-side generate loop
  * (reference: util/GeradorCargaEstruturada.java:17-74 and
  * aplicacoes/ProdutorAvro.java:55-70).
  *
  * Shape: `spark.range(1, n+1)` (already partition-parallel, no driver
  * loop) + pure column expressions. Everything is a codegen'd builtin;
  * at 100 TB this scales linearly with executors because each task
  * generates its own range slice independently — zero shuffle.
  *
  * Determinism: the reference uses unseeded Random/UUID/now(); we
  * derive every field from (seed, sequencia, indice) hashes so t2
  * oracle hashing is possible (SURVEY.md §7.4).
  */
object Generator {

  /** Fixed epoch base for deterministic "timestamps": 2024-01-01T00:00Z. */
  val BaseTs: Long = 1704067200000L

  /** Payload columns for one message row, given a `sequencia` column. */
  private def payloadCols(seed: Long, nRegistros: Int)(seq: Column): Seq[(String, Column)] = {
    val s = lit(seed)
    def registro(i: Column) = struct(
      i.cast("int").as("indice"),
      deterministicText(100, s, seq, i, lit("texto")).as("texto"),
      deterministicUniform(1000.0, s, seq, i, lit("numero")).as("numero"),
      (lit(BaseTs) + seq).as("timestamp"),
      deterministicUuid(s, seq, i, lit("uuid")).as("uuid"))
    Seq(
      "id" -> deterministicUuid(s, seq, lit("id")),
      "timestamp" -> (lit(BaseTs) + seq),
      "sequencia" -> seq,
      "dados" -> transform(sequence(lit(0), lit(nRegistros - 1)), i => registro(i)),
      "versao" -> lit("1.0"))
  }

  /** The `messages` table with envelope columns (FIXTURES.md §A):
    * chave/particao per the reference's producer record
    * (ProdutorAvro.java:67-68: key "msg-"+i, partition (i-1)%P),
    * bytes_avro/bytes_json = serialized sizes on each path, sucesso =
    * deterministic error injection (1 in 97 fails) standing in for the
    * producer-callback error accounting (ProdutorAvro.java:74-90).
    */
  def messages(spark: SparkSession, conf: EngineConf): DataFrame = {
    val n = conf.totalMensagens
    val base = spark.range(1, n + 1).toDF("sequencia")
    val withPayload = payloadCols(conf.seed, conf.registrosPorMensagem)(col("sequencia"))
      .foldLeft(base) { case (df, (name, c)) =>
        if (name == "sequencia") df else df.withColumn(name, c)
      }
    val payload = struct(
      col("id"), col("timestamp"), col("sequencia"), col("dados"), col("versao"))
    withPayload
      .withColumn("chave", concat(lit("msg-"), col("sequencia")))
      .withColumn("particao",
        pmod(col("sequencia") - 1, lit(conf.numParticoes.toLong)).cast("int"))
      .withColumn("bytes_avro",
        length(AvroSerde.to_avro(payload, SchemaDef.mensagemAvroJson)).cast("long"))
      .withColumn("bytes_json", octet_length(to_json(payload)).cast("long"))
      .withColumn("sucesso", pmod(col("sequencia"), lit(97L)) =!= 0)
      .select("sequencia", "chave", "particao", "id", "timestamp", "versao",
        "dados", "bytes_avro", "bytes_json", "sucesso")
  }

  /** Serialized views, the analogue of the two producer wire formats:
    * (chave, particao, valor) plus the envelope metadata the producer
    * callback accounting needs (sequencia/timestamp/sucesso — the
    * Kafka analogues are the record key/timestamp and send result).
    * `valor` is the ONLY serialization of the payload in the plan;
    * producer metrics derive from `octet_length(valor)` downstream
    * rather than re-serializing. */
  def rawAvro(messages: DataFrame): DataFrame =
    messages.select(col("chave"), col("particao"), col("sequencia"),
      col("timestamp"), col("sucesso"),
      AvroSerde.to_avro(payloadStruct, SchemaDef.mensagemAvroJson).as("valor"))

  def rawJson(messages: DataFrame): DataFrame =
    messages.select(col("chave"), col("particao"), col("sequencia"),
      col("timestamp"), col("sucesso"), to_json(payloadStruct).as("valor"))

  private def payloadStruct: Column = struct(
    col("id"), col("timestamp"), col("sequencia"), col("dados"), col("versao"))
}
