package graft.sources

/** Cheap content signature for fixture/table paths, used to key
  * driver-side memoization (cached row counts, persisted subplans) so a
  * regenerated fixture at the same path invalidates the cache instead
  * of silently serving stale state (a test/bench loop regenerating
  * data in one JVM would otherwise degrade silently).
  */
object FsSig {

  /** Fold (name, length, mtime) over the path's regular files — a file
    * is its own single entry; a directory contributes its direct
    * children (parquet dirs are flat). Missing path folds to 0. */
  def of(path: String): Long = {
    val f = new java.io.File(path)
    val files: Seq[java.io.File] =
      if (!f.exists()) Seq.empty
      else if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq.filter(_.isFile)).getOrElse(Seq.empty)
    files.sortBy(_.getName).foldLeft(17L) { (acc, file) =>
      var h = acc * 31 + file.getName.hashCode
      h = h * 31 + file.length()
      h * 31 + file.lastModified()
    }
  }
}
