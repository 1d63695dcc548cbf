package graft.tools

import graft.functions.{TextFunctions => F, VectorFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash pipeline stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorFunctions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (args.lift(1).contains("pipeline")) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      time("plain count")(orders.count())
      time("zipWithIndex count")(
        graft.sources.Reader.withRowNumbers(orders, 1).count())
      time("validate compile count")(
        graft.operators.Validator.compile(
          graft.sources.Reader.withRowNumbers(orders, 1),
          graft.queries.PipelineBench.OrdersSource, "x", 0L).count())
      time("full pipeline_etl")(
        graft.queries.PipelineBench.pipelineEtl(spark, dir).head())
      spark.stop(); return
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val withIds = docs.select(col("doc_id"),
      VectorFunctions.shingleIds(col("text"), 2).as("ids"))
      .withColumn("sig", VectorFunctions.minhashSig(col("ids"), 16))
      .cache()
    time("1 ids+sig+cache")(withIds.count())
    val banded = withIds.select(col("doc_id"),
      explode(F.bandKeys(col("sig"), 8, 2)).as("band"))
    time("2 banded")(banded.count())
    val cand = banded.select(col("doc_id").as("doc_a"), col("band"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band")), Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().cache()
    val nc = time("3 candidates")(cand.count())
    println(s"  candidates=$nc")
    val verified = cand
      .join(withIds.select(col("doc_id").as("doc_a"), col("ids").as("ids_a")), Seq("doc_a"))
      .join(withIds.select(col("doc_id").as("doc_b"), col("ids").as("ids_b")), Seq("doc_b"))
      .select(VectorFunctions.jaccardIds(col("ids_a"), col("ids_b")).as("j"))
      .agg(count(lit(1)), count(when(col("j") >= 0.2, 1)))
    time("4 verify")(verified.head())
    spark.stop()
  }
}
