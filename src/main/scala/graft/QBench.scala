package graft

/** Focused micro-benchmark over named `SparkEntry.queries` entries —
  * the single-query magnifier next to the full `Bench` sweep (usage:
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.QBench q65_trunc_fidelity[,q41_ann_lsh...] [passes]`).
  * Same measurement discipline as Bench (one warm pass + N timed
  * passes through the noop sink); prints one line per entry. */
object QBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-qbench")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[qbench] unknown query: $n")
        case Some(fn) =>
          def go(): Unit =
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val warm = time(go())
          val timed = (1 to passes).map(_ => time(go()))
          println(s"QBENCH $n warm=${fmt(warm)} " +
            s"timed=[${timed.map(fmt).mkString(",")}] min=${fmt(timed.min)}")
      }
    }
    spark.stop()
  }
}
