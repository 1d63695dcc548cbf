package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted eval-set contamination index — the decontamination analogue
  * of [[MinhashIndex]]: benchmark/eval suites are FIXED small corpora
  * while training batches arrive continuously, so the eval side's n-gram
  * evidence is extracted ONCE at build time and every release probes it,
  * instead of re-shingling the eval sets per check (the inline
  * `contamination_check`/`decontam_filter` shape recomputes both sides
  * each run — right for an audit query, wrong for a release loop).
  *
  * Layout under `indexDir`:
  *   - `grams/` — (id) distinct 31-bit gram ids of the eval docs (the
  *     contamination evidence), PARTITIONED BY gp = pmod(xxhash64(id),
  *     64) and sorted by id within partitions: a probe collects its
  *     batch's ≤64 gp values for partition pruning and gets row-group
  *     min/max pushdown on the id equi-join — small batches read a
  *     sliver of the evidence.
  *
  * Gram basis is the md5-derived [[graft.functions.VectorFunctions
  * .shingleIds]] the contamination family already uses, so every count a
  * probe produces is DuckDB-oracle-reproducible. Heavy-gram handling
  * follows `decontam_filter` (reference-free boilerplate guard): grams
  * whose TRAIN-side document frequency exceeds the cap are not treated
  * as evidence — the probe computes the batch's df itself, so the cap
  * needs no persisted state.
  */
object ContamIndex {
  import graft.functions.VectorFunctions.shingleIds

  val NumGramPartitions = 64

  private def gp(id: Column): Column =
    pmod(xxhash64(id), lit(NumGramPartitions.toLong)).cast("int")

  /** Build the evidence from `(doc_id, text, ...)` eval documents.
    * Rebuild = overwrite (the eval suite changed); single writer at a
    * time, like the [[MinhashIndex]] contract.
    */
  def build(evalDocs: DataFrame, indexDir: String, gramN: Int = 5): Unit =
    writeGrams(evalDocs, indexDir, gramN, overwrite = true)

  private def writeGrams(evalDocs: DataFrame, indexDir: String, gramN: Int,
                         overwrite: Boolean): Unit = {
    graft.functions.VectorFunctions.register(evalDocs.sparkSession)
    evalDocs
      .select(explode(shingleIds(col("text"), gramN)).as("id"))
      .distinct()
      .withColumn("gp", gp(col("id")))
      .sortWithinPartitions("id")
      .write.mode(if (overwrite) "overwrite" else "append").partitionBy("gp")
      .parquet(s"$indexDir/grams")
  }

  /** Eval suites ACCRETE (new benchmarks appear); each named suite folds
    * in exactly once. `ingest` appends `suite`'s distinct grams when the
    * suites manifest does not list it yet (builds fresh when the index
    * does not exist) and records the suite afterwards. Duplicate gram
    * rows across suites — or from a crash between the gram append and
    * the manifest write (the suite re-ingests next call) — are harmless:
    * the probe's evidence join is a left-semi, where multiplicity does
    * not change the answer. Returns true when the suite was ingested.
    */
  def ingest(evalDocs: DataFrame, indexDir: String, suite: String,
             gramN: Int = 5): Boolean = {
    val spark = evalDocs.sparkSession
    if (ingestedSuites(spark, indexDir).contains(suite)) false
    else {
      val grams = new org.apache.hadoop.fs.Path(s"$indexDir/grams")
      val exists = grams
        .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(grams)
      writeGrams(evalDocs, indexDir, gramN, overwrite = !exists)
      recordSuite(spark, indexDir, suite)
      true
    }
  }

  /** The suites manifest: one ingested suite label per line. */
  def ingestedSuites(spark: SparkSession, indexDir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_SUITES")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  private def recordSuite(spark: SparkSession, indexDir: String,
                          suite: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "_SUITES")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = ingestedSuites(spark, indexDir)
    val out = fs.create(p, true)
    try out.write((prior + suite).toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The training-batch rows that survive decontamination: a batch doc is
    * DROPPED when any of its grams (batch-df ≤ `dfCap`, the boilerplate
    * guard) appears in the eval evidence. The probe reads only the
    * batch's gp partitions (pruned via a ≤64-value collect), the gram
    * equi-join collides candidates, and the whole pass is O(batch +
    * collisions) — the eval sets are never re-shingled.
    */
  def decontaminate(spark: SparkSession, batch: DataFrame, indexDir: String,
                    dfCap: Int = 10000, gramN: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // deliberately uncached: lazy return must not pin a cache the caller
    // cannot release (the MinhashIndex.novelDocs convention)
    val bGrams = batch
      .select(col("doc_id"), explode(shingleIds(col("text"), gramN)).as("id"))
    val heavy = bGrams.groupBy("id").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("id")
    // bounded collect: at most NumGramPartitions distinct values
    val gps = bGrams.select(gp(col("id")).as("gp")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val evidence = spark.read.parquet(s"$indexDir/grams")
      .filter(col("gp").isin(gps: _*))
      .select("id")
      .join(heavy, Seq("id"), "left_anti")
    val dropped = bGrams.join(evidence, Seq("id"), "left_semi")
      .select("doc_id").distinct()
    batch.join(dropped, Seq("doc_id"), "left_anti")
  }
}
