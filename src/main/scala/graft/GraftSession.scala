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
      // AQE's default 1 MB coalescing floor collapses every sub-MB
      // shuffle to ONE partition, serializing whole post-shuffle stages
      // (windows, candidate joins) onto a single core at small inputs —
      // measured: q44 2.48→1.48 s, q215 2.91→1.25 s at sf0.1 with a
      // 64 KB floor. Scale-safe: once a shuffle carries real volume the
      // parallelismFirst/advisory sizing (bytes ÷ cluster parallelism,
      // 64 MB advisory) dominates and this floor is never the binding
      // constraint — it only governs the tiny-shuffle regime. Env-
      // overridable for deployments that want the stock floor back.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED_PARTITION", "64k"))
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
    * `spark.sql(...)` API surface — for ad-hoc sessions built without
    * `spark.sql.extensions=graft.GraftExtensions` (cluster deployments
    * use the extensions path; both read the same definition list, see
    * [[GraftExtensions.functions]]). */
  def registerFunctions(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
