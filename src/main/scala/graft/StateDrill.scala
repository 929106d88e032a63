package graft

import org.apache.spark.sql.functions._

/** Round-13 verdict #5 measurement harness: the sq13 recovery drill
  * (time-split input, two runs sharing one durable checkpoint) timed
  * under SNAPSHOT vs CHANGELOG RocksDB checkpointing. Prints one JSON
  * line `STATE_DRILL: {...}` with, per mode: run1/run2 wall seconds
  * (run2 = restart: state restore + the increment) and the checkpoint
  * size in bytes after each run. The deltas land in PERF.md; the
  * result-equality legs live in Round14Spec / the Verify oracle gate.
  *
  * Usage: `sbt "runMain graft.StateDrill [sfDir]"` (default sf0.1).
  */
object StateDrill {

  private def duBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val st = java.nio.file.Files.walk(root)
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally st.close()
    }
  }

  private def countSuffix(p: String, suffix: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val st = java.nio.file.Files.walk(root)
      try st.filter(f => f.toString.endsWith(suffix)).count()
      finally st.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-state-drill")
    spark.sparkContext.setLogLevel("WARN")

    def drill(changelog: Boolean): String = {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_drill_${changelog}_").toString
      val (src, ckpt, out) = (s"$work/src", s"$work/ckpt", s"$work/out")
      val all = spark.read.parquet(s"$dir/events.parquet")
      val norm = graft.sources.TsBridge.normalize(all)
      // time-split halves via anti/semi joins (no driver-side id set —
      // the spec's collect() shortcut would not scale past the gate SF)
      val mid = norm.agg(expr(
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY unix_micros(ts))"))
        .head().getDouble(0).toLong
      val firstIds = norm.filter(unix_micros(col("ts")) <= mid)
        .select("event_id")
      all.join(firstIds, Seq("event_id"), "left_semi")
        .write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      val r1 = graft.streaming.StreamOps
        .sq13Incremental(spark, src, ckpt, out, changelog = changelog)
      val run1 = (System.nanoTime() - t0) / 1e9
      val size1 = duBytes(ckpt)
      all.join(firstIds, Seq("event_id"), "left_anti")
        .write.mode("append").parquet(src)
      val t1 = System.nanoTime()
      val r2 = graft.streaming.StreamOps
        .sq13Incremental(spark, src, ckpt, out, changelog = changelog)
      val run2 = (System.nanoTime() - t1) / 1e9
      val size2 = duBytes(ckpt)
      f"""{"rows":[$r1,$r2],"run1_sec":$run1%.2f,"run2_sec":$run2%.2f,""" +
        s""""ckpt_bytes_run1":$size1,"ckpt_bytes_run2":$size2,""" +
        s""""n_changelog_files":${countSuffix(ckpt, ".changelog")},""" +
        s""""n_snapshot_zips":${countSuffix(ckpt, ".zip")}}"""
    }

    val snap = drill(changelog = false)
    val clog = drill(changelog = true)
    println(s"""STATE_DRILL: {"sf":"$dir","snapshot":$snap,"changelog":$clog}""")
    spark.stop()
  }
}
