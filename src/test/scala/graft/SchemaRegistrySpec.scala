package graft

import graft.sources.{CachingSchemaRegistry, HttpSchemaRegistry, InMemorySchemaRegistry, SchemaRegistryClient}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Schema Registry client semantics (reference
  * ConfiguracaoKafka.java:22-24,151-156): subject naming, idempotent
  * register, id→schema resolution, the auto-register gate, the
  * id/schema cache, basic-auth and request shaping for the HTTP
  * surface — everything assertable without a live registry (the
  * KafkaIO construction discipline). */
class SchemaRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("registry-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = graft.model.SchemaDef.mensagemAvroJson

  test("TopicNameStrategy subject naming") {
    assert(SchemaRegistryClient.valueSubject("carga-sandbox-avro") ==
      "carga-sandbox-avro-value")
  }

  test("register is idempotent; ids allocate in first-use order from 1") {
    val r = new InMemorySchemaRegistry()
    val id1 = r.register("a-value", schema)
    val id2 = r.register("b-value", "{\"type\":\"string\"}")
    assert(id1 == 1 && id2 == 2)
    assert(r.register("a-value", schema) == id1, "re-register must return the same id")
    assert(r.schemaById(id1) == schema)
    assert(r.size == 2)
    intercept[NoSuchElementException](r.schemaById(99))
  }

  test("lookup-only mode (AUTO_REGISTER_SCHEMAS=false) refuses unknown schemas") {
    val r = new InMemorySchemaRegistry(autoRegister = false)
    intercept[IllegalStateException](r.register("locked-value", schema))
    assert(!SchemaRegistryClient.autoRegister(Map("AUTO_REGISTER_SCHEMAS" -> "false")))
    assert(SchemaRegistryClient.autoRegister(Map.empty), "reference default is true")
  }

  test("cache turns repeat register/resolve into hits (one round trip per schema)") {
    val inner = new InMemorySchemaRegistry()
    val c = new CachingSchemaRegistry(inner)
    val id = c.register("t-value", schema)
    (1 to 5).foreach(_ => assert(c.register("t-value", schema) == id))
    (1 to 5).foreach(_ => assert(c.schemaById(id) == schema))
    val (hits, misses) = c.stats
    // 1 register miss; schemaById(id) hits immediately (filled by register)
    assert(misses == 1, s"expected one miss, got $misses")
    assert(hits == 10, s"expected ten hits, got $hits")
  }

  test("registry id round-trips through the certified wire framing") {
    // the q49 integration: the id the registry allocates is the id the
    // 5-byte wire header carries and the consumer extracts
    val r = new InMemorySchemaRegistry()
    val id = r.register(SchemaRegistryClient.valueSubject("carga-sandbox-avro"), schema)
    val msgs = graft.sources.Generator.messages(spark,
      graft.model.EngineConf(totalMensagens = 5, tamanhoMensagemKB = 1, seed = 42))
    val payload = struct(col("id"), col("timestamp"), col("sequencia"),
      col("dados"), col("versao"))
    val wired = msgs.select(
      graft.functions.GraftFunctions.confluentWrap(
        graft.functions.AvroSerde.to_avro(payload, schema), id).as("wire"))
    val ids = wired.select(
      graft.functions.GraftFunctions.confluentSchemaId(col("wire")).as("sid"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(id))
    // and the registry resolves that id back to the exact schema text
    // the decoder needs
    assert(r.schemaById(ids.head) == schema)
  }

  test("HTTP surface: basic auth, paths, body escape, response parsing") {
    val auth = HttpSchemaRegistry.basicAuth(Map(
      "SCHEMA_REGISTRY_API_KEY" -> "AK", "SCHEMA_REGISTRY_API_SECRET" -> "SC"))
    assert(auth.contains("Basic " + java.util.Base64.getEncoder
      .encodeToString("AK:SC".getBytes("UTF-8"))))
    assert(HttpSchemaRegistry.basicAuth(Map.empty).isEmpty)
    // path segments percent-encode (round-7 ADVICE: URLEncoder's form
    // encoding would register 'a b' under the literal subject 'a+b')
    assert(HttpSchemaRegistry.registerPath("a b-value") == "/subjects/a%20b-value/versions")
    assert(HttpSchemaRegistry.registerPath("a+b-value") == "/subjects/a%2Bb-value/versions")
    assert(HttpSchemaRegistry.schemaPath(7) == "/schemas/ids/7")
    // body escape/parse round-trips the schema (it is JSON full of quotes)
    val body = HttpSchemaRegistry.registerBody(schema)
    assert(body.startsWith("{\"schema\": \""))
    assert(HttpSchemaRegistry.schemaFromResponse(body) == schema)
    assert(HttpSchemaRegistry.idFromResponse("{\"id\": 42}") == 42)
    intercept[IllegalStateException](HttpSchemaRegistry.idFromResponse("{}"))
  }

  test("fromEnv gates on SCHEMA_REGISTRY_URL; HTTP client fails at the socket, not before") {
    assert(SchemaRegistryClient.fromEnv(Map.empty).isInstanceOf[InMemorySchemaRegistry])
    val http = SchemaRegistryClient.fromEnv(Map(
      "SCHEMA_REGISTRY_URL" -> "http://127.0.0.1:1",
      "SCHEMA_REGISTRY_API_KEY" -> "AK", "SCHEMA_REGISTRY_API_SECRET" -> "SC"))
    assert(http.isInstanceOf[CachingSchemaRegistry])
    // port 1 never listens: a fully-formed request must die at connect
    // time (proving URI/headers/body built), not in request shaping
    val e = intercept[Exception](http.register("t-value", schema))
    assert(e.isInstanceOf[java.net.ConnectException] ||
      e.getCause.isInstanceOf[java.net.ConnectException] ||
      e.isInstanceOf[java.net.http.HttpConnectTimeoutException],
      s"expected a connect-layer failure, got: $e")
  }
}
