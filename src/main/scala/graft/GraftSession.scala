package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession with scale-sane
  * defaults: AQE on (runtime re-plan, skew-join splitting, partition
  * coalescing), shuffle partitions sized to the local core count
  * instead of the 200 default, UTC timezone for oracle parity.
  *
  * On a real cluster the same knobs apply — only master/memory change;
  * shuffle partitions would be sized to cluster cores × 2-3.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = defaultCores): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata writes events.ts as parquet TIMESTAMP(NANOS),
      // which Spark 4 rejects by default; read as long nanos instead
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    registerFunctions(s)
    s
  }

  /** Expose the engine's custom Catalyst expressions to SQL — the
    * `spark.sql(...)` API surface: graft_dot (codegen'd dot product),
    * graft_polyhash (codegen'd rolling hash), graft_to_avro /
    * graft_from_avro (payload-schema Avro serde). */
  def registerFunctions(s: SparkSession): Unit = {
    import graft.functions.{DotProduct, FromAvro, ToAvro, TokenPolyHash}
    import graft.model.SchemaDef
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_polyhash",
      exprs => TokenPolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_to_avro",
      exprs => ToAvro(exprs.head, SchemaDef.mensagemAvroJson), "built-in")
    reg.createOrReplaceTempFunction("graft_from_avro",
      exprs => FromAvro(exprs.head, SchemaDef.mensagemAvroJson), "built-in")
  }
}
