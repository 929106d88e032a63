package graft

import graft.model.EngineConf
import graft.sources.Generator
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Two phases, mirroring the reference's methodology (README.md
  * benchmark modes: produce = generate+serialize+send, consume =
  * fetch+[deserialize]; warm-up excluded — SURVEY.md §6):
  *
  *  1. serde — the reference's workload shape (100 000 × ~1 KB
  *     messages): produce avro/json to files, consume back in
  *     E2E_PARSE and TRANSPORTE modes; reported as msg/s next to the
  *     reference's 6 253.95 msg/s README number.
  *  2. queries — headline relational + llmops queries on
  *     SPARK_GRAFT_SF_DIR, each materialized through the noop sink
  *     (full execution, zero sink cost — `.count()` would let Catalyst
  *     prune the plan to a metadata scan).
  *
  * One JVM-warmup action runs first and is not reported.
  */
object Bench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Execute the full plan with no sink cost. */
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder("graft-bench", cores = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- phase 1: serde, the reference's README workload shape
    val conf = EngineConf(totalMensagens = 100000, tamanhoMensagemKB = 1,
      warmupMensagens = 0, seed = 42)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench_").toString
    val serde = scala.collection.mutable.LinkedHashMap[String, Double]()

    // JVM/codegen warm-up (not reported)
    run(Generator.messages(spark, conf.copy(totalMensagens = 5000)))

    // the exact CLI pipelines (produce = generate+serialize+write,
    // consume = read+[parse]+metrics). EVERY mode gets one untimed
    // warm-up pass immediately before its timed pass — the same
    // discipline phase 2 applies per query. Round 1 timed each mode
    // once, cold, in a fixed order, and the ordering artifacts were
    // visible (json TRANSPORTE measured slower than json E2E_PARSE,
    // which is impossible in steady state: transport skips the parse).
    val e2e = conf.copy(benchMode = "E2E_PARSE")
    val transp = conf.copy(benchMode = "TRANSPORTE")
    val serdeRuns: Seq[(String, () => Unit)] = Seq(
      "produce_avro" -> (() => Main.produce(spark, conf, tmp, avro = true).collect()),
      "produce_json" -> (() => Main.produce(spark, conf, tmp, avro = false).collect()),
      "consume_avro_e2e" -> (() => Main.consume(spark, e2e, tmp, avro = true).collect()),
      "consume_json_e2e" -> (() => Main.consume(spark, e2e, tmp, avro = false).collect()),
      "consume_avro_transporte" -> (() => Main.consume(spark, transp, tmp, avro = true).collect()),
      "consume_json_transporte" -> (() => Main.consume(spark, transp, tmp, avro = false).collect()))
    serdeRuns.foreach { case (name, go) =>
      go() // warm: JIT, codegen cache, page cache for this mode's files
      serde(name) = time(go())
    }

    // ---- phase 2: headline queries at the SF dir
    val headline = Seq(
      "q10_pricing_summary", "q11_revenue_nation", "q12_top_customers",
      "q13_window_orders", "q17_distinct", "q20_latest_by_key", "q21_tumbling",
      "q30_textstats", "q35_jaccard_pairs", "q37_neardup_lsh", "q38_simhash",
      "q39_neardup_capped", "q40_cosine_topk", "q41_ann_lsh", "q43_cos_neardup",
      "q45_media_meta", "q50_bucketed_join", "q53_simhash_neardup")
    // one untimed pass per query (JIT + codegen warm-up), then the
    // timed steady-state pass — the reference's warm-up discipline
    // (README.md benchmark methodology) applied per plan
    val qtimes = scala.collection.mutable.LinkedHashMap[String, Double]()
    headline.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[bench] unknown headline query: $name")
        case Some(fn) =>
          // per-query isolation: one failure must not lose the run
          try {
            run(fn(spark, sfDir))
            qtimes(name) = time(run(fn(spark, sfDir)))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              qtimes(name) = -1.0
          }
      }
    }

    // locale-fixed formatting: the f-interpolator honors the JVM
    // default locale and would emit comma decimals (invalid JSON)
    def num(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    val total = serde.values.sum + qtimes.values.filter(_ >= 0).sum
    val msgsPerSecAvro = conf.totalMensagens / serde("consume_avro_e2e")
    val qs = (serde ++ qtimes).map { case (k, v) => s""""$k":${num(v, 3)}""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","cpus":$cpus,"serde_msgs":${conf.totalMensagens},""" +
        s""""avro_e2e_msgs_per_sec":${num(msgsPerSecAvro, 1)}}"""
    // machine-readable copy: sbt decorates stdout with [info]/[error]
    // prefixes, so a parser scraping the log can fail — also write the
    // JSON to a file (driver/BENCH consumers read this path)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Exception => System.err.println(s"[bench] write $outPath: $e") }
    println(json)
    spark.stop()
  }
}
