package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual [[graft.SparkEntry.queries]] entries by name — the
  * paired-control adjudication tool: run it before and after a change
  * (same host, same data, back to back) and compare best-of-N, without
  * paying a full Bench sweep per measurement.
  *
  * Usage: `runMain graft.tools.TimeQuery <sfDir> <name> [<name> ...]`
  * (env `SPARK_GRAFT_CPUS`, reps via `SPARK_GRAFT_REPS`, default 3).
  * Prints one line per entry: best / median over reps.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: TimeQuery <sfDir> <name> [...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup outside every measurement (Bench's rule): codegen,
    // broadcast, shuffle machinery initialize on a throwaway query
    val qs = graft.SparkEntry.queries
    names.headOption.foreach { n =>
      try { qs(n)(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val f = qs.getOrElse(n,
        sys.error(s"unknown query '$n' — not in SparkEntry.queries"))
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"query":"$n","best":${times.head}%.3f,""" +
        f""""median":${times(times.size / 2)}%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}
