package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming re-expression of the reference's consumer loop
  * (reference: aplicacoes/ConsumidorAvro.java:72-121 — poll loop with
  * a message-count target and a 30 s inactivity stop; SURVEY.md O10-O12).
  *
  * Batch and streaming share the same logical plan pieces: the
  * streaming SQ1 window aggregation below must equal the batch q21
  * result on the same input — that equivalence IS the oracle (the
  * driver hash-checks it against DuckDB exactly like a batch query).
  *
  * Scale notes: a file/Kafka stream parallelizes per file-split /
  * topic-partition (task-per-partition replaces the reference's
  * thread-per-partition); the windowed aggregation keeps one state
  * store entry per (window, event_type) — bounded state, watermark
  * expires it. `Trigger.AvailableNow` gives the reference's
  * "consume until target reached, then finish" semantics exactly.
  */
object StreamOps {

  /** events schema as stored by the driver (ts is TIMESTAMP(NANOS),
    * surfaced as long nanos under nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", LongType)))

  /** Spark's file stream source lists a DIRECTORY; the testdata tables
    * are single parquet files. Stage a per-run temp dir containing a
    * symlink to the file. */
  private[streaming] def stageAsDir(path: String): String = {
    val f = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(f)) path
    else {
      val d = java.nio.file.Files.createTempDirectory("graft_stream_")
      d.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(d.resolve(f.getFileName), f)
      d.toString
    }
  }

  /** Streaming source over the events parquet (file source — the
    * offline stand-in for the Kafka source; same DataFrame downstream). */
  def eventsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(eventsSchema).parquet(stageAsDir(s"$dir/events.parquet"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** SQ1 logical plan: tumbling 1-hour window × event_type, count and
    * exact-DECIMAL value sum — shared verbatim by the batch oracle
    * query (q21) and the streaming run. */
  def sq1Plan(events: DataFrame): DataFrame =
    events
      // group on the window column itself (not window.start): the time
      // window attribute carries the event-time metadata append-mode
      // watermark tracking needs
      .groupBy(window(col("ts"), "1 hour").as("janela_w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("soma_valor"))
      .select(unix_millis(col("janela_w.start")).as("janela_ms"), col("event_type"), col("n"),
        col("soma_valor"))

  /** Run SQ1 as a real streaming query (AvailableNow → memory sink),
    * block until it drains, return the materialized result. Complete
    * output mode: every window is emitted on the final trigger, so the
    * result equals the batch aggregation — watermark/append late-data
    * semantics are exercised separately in [[sq1Append]]. */
  def sq1StreamTumbling(s: SparkSession, dir: String): DataFrame = {
    val name = s"sq1_${System.nanoTime()}"
    val q = sq1Plan(eventsStream(s, dir))
      .writeStream.queryName(name).format("memory")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name).orderBy("janela_ms", "event_type")
  }

  /** SQ1 with a watermark in append mode: only windows the watermark
    * has passed are emitted — the late-data-discipline variant. On a
    * bounded input the final (max-ts) window stays open and is withheld:
    * asserted in StreamOpsSpec, not oracle-compared. */
  def sq1Append(s: SparkSession, dir: String, delay: String = "1 hour"): DataFrame = {
    val name = s"sq1a_${System.nanoTime()}"
    val q = sq1Plan(eventsStream(s, dir).withWatermark("ts", delay))
      .writeStream.queryName(name).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name).orderBy("janela_ms", "event_type")
  }

  /** The reference's running metrics counters as a streaming
    * aggregation over the messages stream (O18 parity): one global
    * state row, updated per micro-batch. */
  def streamingMetrics(messages: DataFrame): DataFrame =
    messages.agg(
      count(lit(1)).as("total_mensagens"),
      sum(when(col("sucesso"), 1L).otherwise(0L)).as("mensagens_sucesso"),
      sum(when(col("sucesso"), 0L).otherwise(1L)).as("mensagens_com_erro"),
      sum(when(col("bytes_avro") > 0, col("bytes_avro")).otherwise(0L)).as("total_bytes"))

  /** Idle-stop listener — the reference's 30 s inactivity timeout
    * (ConsumidorAvro.java:76-85) on streaming-listener events. Spark
    * reports "no data for spark.sql.streaming.noDataProgressEventInterval"
    * as a QueryIdleEvent (empty batches do NOT produce progress
    * events), so inactivity = idle events after at least one batch. */
  final class IdleStop(query: () => StreamingQuery, maxIdleEvents: Int)
      extends StreamingQueryListener {
    @volatile private var idle = 0
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.numInputRows > 0) idle = 0
    override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = {
      idle += 1
      if (idle >= maxIdleEvents) Option(query()).foreach(_.stop())
    }
  }

  /** Run the streaming metrics over a messages parquet dir with
    * idle-stop (ProcessingTime trigger — the open-ended consumer
    * shape), returning the final counters. */
  def consumeWithIdleStop(s: SparkSession, path: String, schema: StructType,
      maxIdleEvents: Int = 1): DataFrame = {
    val name = s"metrics_${System.nanoTime()}"
    val src = s.readStream.schema(schema).parquet(stageAsDir(path))
    var q: StreamingQuery = null
    val listener = new IdleStop(() => q, maxIdleEvents)
    s.streams.addListener(listener)
    // report idleness promptly so the stop reacts like the reference's
    // inactivity timeout rather than the 10 s default cadence
    s.conf.set("spark.sql.streaming.noDataProgressEventInterval", "2000")
    try {
      q = streamingMetrics(src)
        .writeStream.queryName(name).format("memory")
        .outputMode("complete").trigger(Trigger.ProcessingTime("500 milliseconds")).start()
      q.awaitTermination()
    } finally s.streams.removeListener(listener)
    s.table(name)
  }
}
