package graft.operators

import org.apache.spark.sql.SparkSession

/** The pointer-file generation protocol shared by every persisted index
  * ([[MinhashIndex]] postings, [[VectorIndex]] postings,
  * [[ContamIndex]] train-df): a directory-name pointer file resolves the
  * live generation (falling back to the unversioned default before any
  * fold has run), and publishing a new generation is ONE atomic pointer
  * swing — write a temp pointer, `FileContext.rename(OVERWRITE)` over the
  * live one (atomic on HDFS-semantics filesystems; object stores without
  * atomic rename need a consistent pointer store in front, as with any
  * Hadoop-on-S3 layout). Centralized so the crash seams the chaos matrix
  * exercises are ONE implementation, not three hand-rolled copies.
  */
private[graft] object GenDirs {

  /** The live generation directory: `<dir>/<pointer contents>` when the
    * pointer exists, `<dir>/<default>` otherwise.
    */
  def resolve(spark: SparkSession, dir: String, pointerName: String,
              default: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, pointerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val name =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      } else default
    s"$dir/$name"
  }

  /** Atomic pointer swing to generation `next`. */
  def swap(spark: SparkSession, dir: String, pointerName: String,
           next: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val fs = dirP.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dirP, s".$pointerName.tmp.$next")
    val out = fs.create(tmp, true)
    try out.write(next.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dirP.toUri, conf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(dirP, pointerName),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }
}
