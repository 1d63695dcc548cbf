package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted IVF (inverted-file) vector index — build once, probe many.
  *
  * The inline index ([[graft.queries.TrainingData.simTopkIvf]]) recomputes
  * centroid assignment on every query run; a production similarity-search
  * workflow builds the index ONCE over the corpus and serves many probe
  * batches against it. This operator persists the index as two parquet
  * tables under `indexDir`:
  *
  *   - `postings/` (or a `postings_vN/` generation behind the `_POSTINGS`
  *     pointer) — (vec_id, nv) PARTITIONED BY bucket: the inverted file.
  *     Partitioning is the scale lever — a probe touching `nprobe`
  *     buckets reads only those directories (partition pruning / dynamic
  *     partition pruning on the bucket join), i.e. ~nprobe/n_buckets of
  *     the corpus instead of scanning it all. Each generation CONTAINS
  *     its own `_centroids/` and `_tombstones/` (underscore dirs, ignored
  *     by the bucket scans), so the pointer swing switches the complete
  *     index state atomically.
  *
  * Determinism: centroids are the same `vec_id % centEvery == centOffset`
  * sample and the same rounded-cosine argmin as the inline query, so
  * [[queryIvf]] over a built index reproduces `sim_topk_ivf` bit-for-bit —
  * the index path shares its DuckDB oracle.
  */
object VectorIndex {
  import graft.functions.VectorFunctions.vecDot

  /** Hard count bound on every data-derived centroid pick — shared by
    * [[buildIvf]] and the inline IVF queries
    * ([[graft.queries.TrainingData]] `centroidPick`) so the built index,
    * the inline query, and their common DuckDB oracle stay equivalent at
    * EVERY scale (all three apply the same md5-ordered LIMIT; below the
    * cap it is a no-op, beyond it all three select the identical subset).
    */
  val MaxCentroids = 4096

  /** The deterministic centroid sample: the oracle-reproducible
    * `vec_id % centEvery == centOffset` mod filter, capped at
    * [[MaxCentroids]] via md5-ordered LIMIT (`ORDER BY
    * md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096` in DuckDB). The mod
    * filter alone is corpus-PROPORTIONAL (1-2% of vectors) and this frame
    * is broadcast into every assignment crossJoin — the cap makes that
    * broadcast O(1) in corpus size by construction.
    */
  private[graft] def centroidSample(e: DataFrame, centEvery: Int,
                                    centOffset: Int): DataFrame =
    e.filter(col("vec_id") % centEvery === centOffset)
      .orderBy(md5(col("vec_id").cast(org.apache.spark.sql.types.StringType)),
        col("vec_id"))
      .limit(MaxCentroids)

  /** Nearest-centroid assignment as a `min_by` ARGMIN aggregation over the
    * orderable struct (-csim, cent_id, nv) — identical tie semantics to
    * `row_number() OVER (ORDER BY csim DESC, cent_id)` (highest cosine,
    * lowest cent_id on ties) but with map-side partial combine: one row per
    * VECTOR crosses the shuffle instead of one per (vector, centroid)
    * scored pair. The window form ships n x c rows at 100 TB. The vector
    * itself rides inside the struct ((-csim, cent_id) is already unique per
    * candidate, so the nv field is never compared) — the output carries
    * (vec_id, bucket, nv) directly and no corpus join-back is needed to
    * recover the vectors for the postings write.
    */
  private[graft] def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct((-round(vecDot(col("nv"), col("cv")), 4)).as("neg_csim"),
          col("cent_id"), col("nv")).as("scored"))
      .groupBy("vec_id")
      .agg(min(col("scored")).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("bucket"),
        col("best.nv").as("nv"))

  /** Top-2 multi-assignment: each vector's TWO nearest centroids, as two
    * chained [[assign]]-style argmin passes — the second excludes the
    * first's bucket, so it yields exactly rank 2 of
    * `row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id)`.
    * Each pass is a map-side-combined `min_by`, so 2 rows per vector cross
    * the shuffles (the window form ships the full n x c scored pairs).
    * Multi-assignment is the candidate-generation lever for bucketed
    * near-dup: a pair straddling a centroid boundary still shares its
    * second-choice bucket, where single-assignment silently drops it.
    */
  private[graft] def assignTop2(e: DataFrame, cents: DataFrame): DataFrame = {
    val first = assign(e, cents)
    val second = first
      .withColumnRenamed("bucket", "first_bucket")
      .crossJoin(broadcast(cents))
      .filter(col("cent_id") =!= col("first_bucket"))
      .select(col("vec_id"),
        struct((-round(vecDot(col("nv"), col("cv")), 4)).as("neg_csim"),
          col("cent_id"), col("nv")).as("scored"))
      .groupBy("vec_id")
      .agg(min(col("scored")).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("bucket"),
        col("best.nv").as("nv"))
    first.union(second)
  }

  /** Build the index from `(vec_id: long, nv: array<double>)` unit vectors.
    *
    * A REBUILD is generation-first (the [[graft.operators.MinhashIndex
    * .build]] protocol) and GENERATION-COMPLETE: centroids and tombstones
    * live INSIDE each postings generation (underscore-prefixed subdirs,
    * invisible to the bucket scans), so the single `_POSTINGS` pointer
    * swing atomically switches postings + centroids + tombstones
    * together. That closes three windows a shared-centroids layout has:
    * probes pairing NEW centroids with the OLD generation's buckets
    * during the O(corpus) rebuild, a crash leaving that corrupt pairing
    * served, and a previous life's tombstones masking rows of the new
    * index. The just-superseded generation is retained until the next
    * rebuild/compaction (the [[compactIvf]] rule), so in-flight probes
    * finish on intact files.
    */
  def buildIvf(embeddings: DataFrame, indexDir: String,
               centEvery: Int = 100, centOffset: Int = 3): Unit = {
    val spark = embeddings.sparkSession
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldGens =
      if (fs.exists(dir))
        fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("postings"))
          .map(_.getPath.getName)
      else Seq.empty
    val liveBefore =
      if (oldGens.isEmpty) None
      else Some(livePostingsDir(spark, indexDir)
        .substring(indexDir.length + 1))
    val next =
      if (oldGens.isEmpty) "postings"
      else {
        val maxGen = oldGens.map {
          case "postings" => 0
          case g => g.stripPrefix("postings_v").toInt
        }.max
        s"postings_v${maxGen + 1}"
      }
    val e = embeddings.select(col("vec_id"), col("nv"))
    // capped pick ([[centroidSample]]): without the bound, the mod filter
    // retains a corpus-proportional centroid frame that [[assign]]
    // broadcasts — and the built index would diverge from the inline
    // query + shared oracle once the uncapped sample crossed MaxCentroids
    val cents = centroidSample(e, centEvery, centOffset)
      .select(col("vec_id").as("cent_id"), col("nv").as("cv"))
      .cache()
    // an id space the mod sample never hits would assign NOTHING and
    // leave a data-less postings dir that breaks every later read of the
    // index — fail loud instead of building poison
    try {
      if (cents.isEmpty)
        throw new IllegalArgumentException(
          s"buildIvf: centroid sample vec_id % $centEvery == $centOffset " +
            "matches no vectors — pass centEvery/centOffset that hit the " +
            "corpus id space")
      // postings first (the overwrite clears $next), THEN the generation's
      // centroids under it — nothing references $next until the swing
      assign(e, cents)
        .select(col("vec_id"), col("bucket"), col("nv"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$indexDir/$next")
      cents.write.mode("overwrite").parquet(s"$indexDir/$next/_centroids")
      if (next != "postings") swapPointer(spark, indexDir, next)
      oldGens.filterNot(g => g == next || liveBefore.contains(g)).foreach(g =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, g), true))
      // a rebuild supersedes any legacy-layout shared state, but a RETAINED
      // legacy generation still reads the top-level dirs — defer their
      // deletion to the next cycle (dropLegacyIfUnreferenced scaladoc)
      dropLegacyIfUnreferenced(fs, dir, liveBefore)
    } finally { cents.unpersist(); () }
  }

  /** The live generation's centroids — resolved through the SAME pointer
    * as the postings. NOTE: readers that also touch the postings or
    * tombstones must resolve the pointer ONCE and derive every path from
    * that one resolution ([[genCentroidsDir]]/[[genTombstonesDir]] over a
    * single [[livePostingsDir]] call) — resolving per-component races a
    * concurrent pointer swing into pairing two different generations.
    */
  def liveCentroidsDir(spark: SparkSession, indexDir: String): String =
    genCentroidsDir(spark, livePostingsDir(spark, indexDir))

  /** Centroids path of a RESOLVED generation dir, with legacy fallback:
    * indexes persisted before the generation-complete layout keep
    * centroids at `<indexDir>/centroids` — readable until their next
    * rebuild migrates them.
    */
  private def genCentroidsDir(spark: SparkSession, genDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$genDir/_centroids")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) p.toString
    else s"${genDir.substring(0, genDir.lastIndexOf('/'))}/centroids"
  }

  /** Tombstones of a RESOLVED generation dir (legacy fallback like
    * [[genCentroidsDir]]), or None when nothing was ever deleted.
    */
  private def genTombstones(spark: SparkSession, indexDir: String,
                            genDir: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(genDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a generation-COMPLETE dir (it has its own _centroids) owns ALL of
    // its state: the legacy top-level tombstones belong to pre-migration
    // generations only, and reading them here would let a
    // deferred-deleted (or crash-surviving) legacy set mask rows of the
    // rebuilt index — the exact window the generation-complete layout
    // exists to close. A LEGACY generation that received NEW
    // per-generation deletes before its migrating rebuild/compaction
    // honors BOTH sets (union, not shadow — shadowing would resurrect
    // the legacy deletions).
    val genComplete = fs.exists(
      new org.apache.hadoop.fs.Path(s"$genDir/_centroids"))
    val candidates =
      if (genComplete) Seq(s"$genDir/_tombstones")
      else Seq(s"$genDir/_tombstones", s"$indexDir/tombstones")
    val sets = candidates
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      .map(spark.read.parquet(_))
    sets.reduceOption(_ unionByName _)
  }

  /** Retire the legacy top-level `centroids/`/`tombstones/` dirs — but
    * only once no retained generation still resolves to them: the
    * just-superseded generation is kept for in-flight probes, and when it
    * is itself legacy (no `_centroids` of its own) those probes read the
    * top-level dirs through the [[genCentroidsDir]]/[[genTombstones]]
    * fallbacks — deleting them mid-flight is a FileNotFoundException.
    * Deferred exactly like superseded generations: the NEXT
    * rebuild/compaction (whose retained generation is
    * generation-complete) drops them.
    */
  private def dropLegacyIfUnreferenced(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      retained: Option[String]): Unit = {
    val stillRead = retained.exists(g => !fs.exists(
      new org.apache.hadoop.fs.Path(dir, s"$g/_centroids")))
    if (!stillRead) {
      fs.delete(new org.apache.hadoop.fs.Path(dir, "centroids"), true)
      fs.delete(new org.apache.hadoop.fs.Path(dir, "tombstones"), true)
      ()
    }
  }

  /** Atomic `_POSTINGS` pointer swing ([[GenDirs.swap]]), shared by
    * [[buildIvf]] rebuilds and [[compactIvf]].
    */
  private def swapPointer(spark: SparkSession, indexDir: String,
                          next: String): Unit =
    GenDirs.swap(spark, indexDir, "_POSTINGS", next)

  /** Incremental maintenance: assign NEW vectors to the EXISTING centroids
    * and append their postings — O(new vectors) work, no rebuild, the same
    * trade every production IVF service makes (FAISS add-with-ids): recall
    * for the appended vectors is defined by the original centroid geometry,
    * so rebuild when the corpus distribution has drifted far enough for
    * centroids to be stale.
    */
  def appendIvf(newEmbeddings: DataFrame, indexDir: String): Unit = {
    val spark = newEmbeddings.sparkSession
    val live = livePostingsDir(spark, indexDir)
    val cents = spark.read.parquet(genCentroidsDir(spark, live))
    val e = newEmbeddings.select(col("vec_id"), col("nv"))
    assign(e, cents)
      .select(col("vec_id"), col("bucket"), col("nv"))
      .write.mode("append").partitionBy("bucket")
      .parquet(live)
  }

  /** The live postings directory: named by the `_POSTINGS` pointer file
    * when one exists (post-compaction layout), the original `postings/`
    * otherwise. Public so external tooling (and the specs) can inspect the
    * physical layout the probes actually read.
    */
  def livePostingsDir(spark: SparkSession, indexDir: String): String =
    GenDirs.resolve(spark, indexDir, "_POSTINGS", "postings")

  /** Logical deletion by tombstone: append the ids to
    * `indexDir/tombstones/` — O(delete batch) work, no posting rewrite
    * (the FAISS remove_ids / Lucene deleted-docs trade). Probes
    * anti-join the tombstone set out ([[queryIvf]]); the NEXT
    * [[compactIvf]] drops the rows physically and clears the tombstones.
    *
    * CONTRACT: a tombstoned id stays invisible even if re-appended before
    * the next compaction (the anti-join cannot tell generations apart) —
    * compact before re-adding a previously deleted id. Single writer at a
    * time, as for [[appendIvf]].
    */
  def deleteIvf(ids: DataFrame, indexDir: String): Unit = {
    val spark = ids.sparkSession
    ids.select(col("vec_id").cast(LongType))
      .write.mode("append")
      .parquet(s"${livePostingsDir(spark, indexDir)}/_tombstones")
  }

  /** Index health: bucket-size distribution and skew ratio. The biggest
    * bucket bounds probe tail latency (every probe of that bucket scans it
    * whole); a skew ratio far above 1 means the centroids no longer fit the
    * data — the rebuild signal for the [[appendIvf]] maintenance loop.
    */
  def indexStats(spark: SparkSession, indexDir: String): DataFrame = {
    // tombstoned rows are invisible to probes, so health stats must not
    // count them either (a skew ratio inflated by already-deleted vectors
    // would trigger a pointless rebuild). ONE pointer resolution for both
    // components (see liveCentroidsDir note)
    val live = livePostingsDir(spark, indexDir)
    val sizes = genTombstones(spark, indexDir, live)
      .foldLeft(spark.read.parquet(live))(
        (p, t) => p.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
    sizes.agg(
      count(lit(1)).as("n_buckets"),
      sum("sz").as("n_vectors"),
      min("sz").as("min_bucket"),
      max("sz").as("max_bucket"),
      round(avg("sz"), 2).as("avg_bucket"),
      round(max("sz") / avg("sz"), 2).as("skew_ratio"))
  }

  /** Compact the postings after a run of [[appendIvf]] micro-batches: each
    * append writes one small file per touched bucket, and probe latency
    * degrades with file count (open/footer cost per file). Rewrites every
    * bucket partition to ONE file (hash-repartition on bucket puts each
    * bucket in exactly one task; cap with
    * `spark.sql.files.maxRecordsPerFile` if a skewed bucket needs
    * splitting) into a NEW versioned directory, then publishes it with an
    * atomic pointer swap (`FileContext.rename(OVERWRITE)` on `_POSTINGS`,
    * the [[graft.store.TableStore]] idiom) — a concurrent [[queryIvf]]
    * resolves either the old or the new generation, never a missing path.
    * The superseded generation is retained until the NEXT compaction, so
    * probes that resolved just before the swap finish their scans on
    * intact files; single WRITER at a time remains the caller's contract
    * (as for appendIvf), and object stores without atomic rename need a
    * consistent pointer store in front, as with any Hadoop-on-S3 layout.
    */
  def compactIvf(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = livePostingsDir(spark, indexDir)
    val liveName = live.substring(live.lastIndexOf('/') + 1)
    val nextGen =
      if (liveName == "postings") 1
      else liveName.stripPrefix("postings_v").toInt + 1
    val next = s"postings_v$nextGen"
    // physical delete point: tombstoned rows are dropped from the rewrite,
    // and the tombstone set is cleared AFTER the pointer swap commits (a
    // crash in between only means probes keep anti-joining a now-redundant
    // set — never resurrecting deleted rows)
    val ts = genTombstones(spark, indexDir, live)
    ts.foldLeft(spark.read.parquet(live))(
        (p, t) => p.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/$next")
    // the generation carries its own centroids (and, by folding the
    // tombstones into the rewrite, starts with NONE): copy them over
    // before the swing so the pointer switches a complete generation
    spark.read.parquet(genCentroidsDir(spark, live))
      .write.mode("overwrite").parquet(s"$indexDir/$next/_centroids")
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val fs = dir.getFileSystem(conf)
    // crash seams around the pointer swing (the MinhashIndex.compact
    // matrix): before it the old generation stays live and the
    // half-written next is inert; after it the new generation is
    // complete — on NEITHER side can a probe resurrect tombstoned rows
    // (folded into the rewrite, and the retained old generation keeps
    // its own _tombstones)
    graft.core.Chaos.point("vector.before-compact-swing")
    swapPointer(spark, indexDir, next)
    graft.core.Chaos.point("vector.after-compact-swing")
    // compaction migrates a legacy-layout index: its shared centroids and
    // tombstones are folded into the new generation above — but the
    // RETAINED superseded generation may still read the top-level dirs,
    // so their deletion is deferred to the next cycle like the
    // generation itself (dropLegacyIfUnreferenced scaladoc)
    dropLegacyIfUnreferenced(fs, dir, Some(liveName))
    // reclaim generations older than the one just superseded
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("postings") &&
        st.getPath.getName != next && st.getPath.getName != liveName)
      .foreach(st => fs.delete(st.getPath, true))
    // tombstones were per-generation state of the superseded dir; the new
    // generation starts clean by construction (nothing to clear)
    ()
  }

  /** Top-k cosine neighbors for `(query_id: long, qv: array<double>)`
    * probes against a built index, probing each query's `nprobe` nearest
    * centroid buckets.
    */
  def queryIvf(spark: SparkSession, indexDir: String, queries: DataFrame,
               k: Int = 5, nprobe: Int = 2): DataFrame = {
    // ONE pointer resolution for centroids + tombstones + postings: a
    // concurrent rebuild/compaction swinging the pointer between
    // per-component reads would pair two different generations
    val live = livePostingsDir(spark, indexDir)
    val cents = spark.read.parquet(genCentroidsDir(spark, live))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cent_id"))
    val probe = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cent_id"),
        round(vecDot(col("qv"), col("cv")), 4).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket"))
    // tombstoned vectors stay invisible until the next compaction; the
    // delete set is tiny relative to the corpus, so the anti-join
    // broadcasts — nothing corpus-sized moves for it
    val postings = genTombstones(spark, indexDir, live)
      .foldLeft(spark.read.parquet(live))(
        (p, t) => p.join(broadcast(t), Seq("vec_id"), "left_anti"))
    val scored = probe.join(postings, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(vecDot(col("qv"), col("nv")), 4).as("sim"))
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wTop).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
      .orderBy("query_id", "rank")
  }
}
