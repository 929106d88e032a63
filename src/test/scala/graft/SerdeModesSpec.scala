package graft

import graft.model.{EngineConf, SchemaDef}
import graft.sources.Generator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.jdk.CollectionConverters._

/** Schema-on-read modes for the JSON path (SURVEY.md §1.2: the
  * reference's Gson `Map.class` parse is untyped with lossy numeric
  * typing; the engine's default is an explicit StructType, with
  * inference and untyped views supported but non-default) + sketch
  * aggregates. */
class SerdeModesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val conf = EngineConf(totalMensagens = 200, tamanhoMensagemKB = 1, seed = 42)

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("serde-modes-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rawJson = Generator.rawJson(Generator.messages(spark, conf))

  test("explicit-schema JSON parse is exact (engine default)") {
    val bad = rawJson
      .withColumn("m", from_json(col("valor"), SchemaDef.mensagemType))
      .filter(col("m.sequencia") =!= col("sequencia") ||
        col("m.timestamp") =!= col("timestamp"))
      .count()
    assert(bad == 0)
  }

  test("schema inference types integral JSON numbers as BIGINT (vs Gson all-Double)") {
    val sample = rawJson.select("valor").head().getString(0)
    val inferred = spark.range(1).select(
      schema_of_json(lit(sample)).as("s")).head().getString(0)
    // Spark infers BIGINT for integral numbers — exact, where Gson's
    // Map.class target forces Double on every number (the documented
    // reference asymmetry our explicit schema eliminates)
    assert(inferred.contains("sequencia: BIGINT"), inferred)
    assert(inferred.contains("numero: DOUBLE"), inferred)
    val parsed = rawJson.limit(50)
      .withColumn("m", from_json(col("valor"), lit(inferred), Map.empty[String, String].asJava))
    assert(parsed.select("m.sequencia").schema.head.dataType == LongType)
  }

  test("untyped map view reproduces Gson's Map-of-strings shape") {
    val m = rawJson.limit(20)
      .withColumn("m", from_json(col("valor"), MapType(StringType, StringType)))
    val keys = m.select(explode(map_keys(col("m")))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("id", "timestamp", "sequencia", "dados", "versao"))
  }

  test("corrupt Avro bytes decode to NULL and count as erro (reference consumer parity)") {
    import graft.functions.AvroSerde
    val raw = Generator.rawAvro(Generator.messages(spark, conf))
      .select(col("particao"), col("sequencia"),
        // corrupt every 10th record: truncate to 3 bytes (mid-varint)
        when(col("sequencia") % 10 === 0, expr("substring(valor, 1, 3)"))
          .otherwise(col("valor")).as("valor"))
    val decoded = raw.select(col("sequencia"),
      AvroSerde.from_avro(col("valor"), SchemaDef.mensagemAvroJson).as("m"))
    val got = decoded.select(col("sequencia"), col("m").isNotNull.as("ok")).collect()
    assert(got.length == 200, "every record must survive the decode pass")
    got.foreach { r =>
      val expectOk = r.getLong(0) % 10 != 0
      assert(r.getBoolean(1) == expectOk,
        s"seq ${r.getLong(0)}: corrupt records must decode to NULL, valid ones must not")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

}
