package graft

import org.apache.spark.sql.SparkSession

/** Plan/latency probe for one `SparkEntry.queries` entry: prints the
  * formatted physical plan and per-run wall times. Diagnostic only —
  * the driver uses Verify (correctness) and Bench (timing).
  *
  * Usage: runMain graft.Explain <query_name> <sfDir> [runs]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder("graft-explain", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    println(s"==== $name @ $sfDir ====")
    df.explain("formatted")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $dt%.3f s")
    }
    spark.stop()
  }
}
