package graft

import graft.model.EngineConf

/** Serde-axis forensics probe (round-10 verdict #2: the codec sweep's
  * `consume_avro_e2e_zstd` showed monotone per-pass growth
  * [1.29, 10.35, 13.54] inside one run — a leak-shaped curve, not
  * noise). Loops one codec's produce and consume pipelines N times in
  * a single JVM, printing the per-pass wall time AND the output dir's
  * file count + byte size after every produce pass, so the two
  * hypotheses separate in one run:
  *   files/bytes grow per pass → output-dir accumulation (overwrite
  *     not truncating); consume reads a growing input
  *   files/bytes flat, time grows → in-JVM state (codec context
  *     reuse, GC pressure, listener/plan accumulation)
  *
  * Usage: runMain graft.SerdeLoop [codec] [passes]   (default zstd 10)
  */
object SerdeLoop {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def dirStats(dir: String): (Long, Long) = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val files = if (root.exists) walk(root) else Seq.empty
    (files.size.toLong, files.map(_.length).sum)
  }

  def main(args: Array[String]): Unit = {
    val codec = args.headOption.getOrElse("zstd")
    val passes = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.getOrCreate("graft-serde-loop")
    val conf = EngineConf(totalMensagens = 100000, tamanhoMensagemKB = 1,
      warmupMensagens = 0, seed = 42, compressionType = codec)
    val dir = graft.operators.PlanCache.tempDir(s"graft_serdeloop_${codec}_")
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    (1 to passes).foreach { i =>
      val tp = time(Main.produce(spark, conf, dir, avro = true).collect())
      val (nf, nb) = dirStats(dir)
      val tc = time(Main.consume(spark, conf.copy(benchMode = "E2E_PARSE"),
        dir, avro = true).collect())
      val gc = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum / 1000.0
      }
      println(s"SERDELOOP pass=$i codec=$codec produce=${fmt(tp)} " +
        s"consume=${fmt(tc)} files=$nf bytes=$nb gc_cum=${fmt(gc)}")
    }
    spark.stop()
  }
}
