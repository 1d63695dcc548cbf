package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

/** Versioned parquet table layer — the engine's durable store.
  *
  * Replaces the reference's RDBMS tables (targets, file_load_log,
  * file_load_dlq — reference src/process/db.py:92-209) with a minimal
  * copy-on-write table format:
  *
  *   root/<table>/v_<n>/      parquet data versions
  *   root/<table>/_VERSION    pointer file naming the current version
  *
  * Readers resolve the pointer then scan exactly one version directory;
  * writers produce a NEW version directory and atomically swap the pointer
  * (create temp + rename — rename is atomic on HDFS and local FS). This is
  * what makes the merge-publish rewrite safe: the old version keeps serving
  * until the pointer flips, and a crashed writer leaves only an orphaned
  * directory, never a half-visible table. The same mechanism backs the
  * DLQ-cleanup rewrite (a filter + swap instead of SQL DELETE loops,
  * reference src/pipeline/delete/base.py:31-76).
  *
  * At 100 TB scale each version write is a fully parallel parquet job; the
  * pointer swap is O(1) driver metadata. (A production deployment would use
  * Delta/Iceberg — same design, hardened.)
  */
final class TableStore(spark: SparkSession, root: String) extends Sink {
  private val counter = new AtomicLong(System.currentTimeMillis())
  private def conf = spark.sparkContext.hadoopConfiguration
  private def tableDir(name: String) = new Path(root, name)
  private def pointer(name: String) = new Path(tableDir(name), "_VERSION")

  private def fs(p: Path) = p.getFileSystem(conf)

  def nextId(): Long = counter.incrementAndGet()

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-table mutual exclusion for read-modify-overwrite sequences.
    *
    * The copy-on-write store has no transactions: two concurrent
    * read->merge->pointer-swap sequences on the SAME table would both read
    * the old version and the last swap would silently drop the other's
    * rows (a classic lost update — surfaced by the concurrent-sweep test).
    * Publishes to different tables still run fully in parallel; this lock
    * is driver-side metadata, never held during executor work longer than
    * the table job itself.
    */
  def withTableLock[T](name: String)(f: => T): T =
    locks.computeIfAbsent(name, _ => new Object).synchronized(f)

  override def exists(name: String): Boolean = {
    val p = pointer(name)
    fs(p).exists(p) || segments(name).nonEmpty
  }

  /** Committed append segments (seg_*) of a table, oldest first. */
  private def segments(name: String): Seq[Path] = {
    val dir = tableDir(name)
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg_"))
      .map(_.getPath).sortBy(_.getName)
  }

  private def currentVersion(name: String): Option[String] = {
    val p = pointer(name)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Read the current version plus any append segments; None when the table
    * has never been written.
    */
  override def readIfExists(name: String): Option[DataFrame] = {
    val base = currentVersion(name).map(v => new Path(tableDir(name), v))
    val paths = (base.toSeq ++ segments(name)).map(_.toString)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Read, or an empty frame with the given schema when absent. */
  def readOrEmpty(name: String, schema: StructType): DataFrame =
    readIfExists(name).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** Write a new version and atomically swap the pointer. Append segments
    * present when the write STARTED are folded in by the caller's read plan
    * (the df passed here was built from readIfExists) — they are deleted
    * after the swap so the table never double-counts them.
    *
    * `partitionBy` writes the version hive-partitioned on those columns so
    * partition-pruned reads (date-ranged queries on a date-partitioned
    * target) skip directories entirely.
    */
  override def overwrite(name: String, df: DataFrame,
                         partitionBy: Seq[String]): Unit =
    overwriteFolding(name, df, partitionBy, segments(name))

  /** [[overwrite]] with an EXPLICIT list of segments to fold away: the
    * caller names exactly the segments its `df` was built from, so an
    * append that lands concurrently (appends are lock-free atomic renames)
    * is never deleted unfolded — it simply survives as a segment on top of
    * the new version.
    */
  private def overwriteFolding(name: String, df: DataFrame,
                               partitionBy: Seq[String],
                               foldedSegs: Seq[Path]): Unit = {
    val priorSegs = foldedSegs
    val version = s"v_${counter.incrementAndGet()}"
    val dir = tableDir(name)
    val f = fs(dir)
    val writer = if (partitionBy.isEmpty) df.write
                 else df.write.partitionBy(partitionBy: _*)
    writer.mode("overwrite").parquet(new Path(dir, version).toString)
    val tmp = new Path(dir, s"._VERSION.tmp.${counter.incrementAndGet()}")
    val out = f.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // Atomic rename-with-overwrite via FileContext: FileSystem.rename
    // refuses to replace an existing destination on local/HDFS, and the
    // delete-then-rename emulation opens a window where a concurrent reader
    // sees NO pointer (observing only append segments — a truncated table).
    // FileContext.rename(OVERWRITE) replaces the pointer in one FS op.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
      fc.rename(tmp, pointer(name), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        // last resort for FS without overwrite-rename (e.g. some object
        // stores): plain rename, then delete+rename with its known window
        if (!f.rename(tmp, pointer(name))) {
          f.delete(pointer(name), false)
          if (!f.rename(tmp, pointer(name)))
            throw new java.io.IOException(s"pointer swap failed for $name")
        }
    }
    priorSegs.foreach(s => f.delete(s, true))
  }

  /** Append as an O(new-rows) segment write: the new rows land in a temp
    * dir and become visible via ONE atomic rename to seg_<id> — no
    * read-union-rewrite of existing data (the previous implementation's
    * per-event full-table rewrite is quadratic over a table's life; at
    * 100 TB an append-heavy log table must never re-copy history).
    * Readers union the current version with all committed segments;
    * [[overwrite]] compacts segments away.
    */
  def append(name: String, df: DataFrame): Unit = {
    val dir = tableDir(name)
    val f = fs(dir)
    f.mkdirs(dir)
    val id = counter.incrementAndGet()
    val tmp = new Path(dir, s".tmp_seg_$id")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!f.rename(tmp, new Path(dir, s"seg_$id")))
      throw new java.io.IOException(s"segment commit failed for $name")
  }

  /** Small-file compaction: fold the append segments into a fresh base
    * version once more than `maxSegments` have accumulated. An append-heavy
    * table (run log, filename sidecars) otherwise grows one directory per
    * append and every reader pays per-segment listing + footer costs — at
    * warehouse scale unbounded segment counts are how a metadata layer
    * falls over. The fold is the same read → version-write → atomic
    * pointer-swap path a publish uses; the folded segment list is captured
    * EXPLICITLY, so lock-free concurrent appends are never deleted unfolded
    * (they land after the capture and survive on top of the new version).
    * The table lock only serializes concurrent compact/overwrite of the
    * same table. The fold writes unpartitioned — compact is for the
    * append-heavy metadata tables; partitioned targets compact through the
    * publish path, which preserves their layout. Returns true when a fold
    * happened.
    */
  def compact(name: String, maxSegments: Int = 16): Boolean =
    withTableLock(name) {
      val segs = segments(name)
      if (segs.size <= maxSegments) false
      else {
        val base = currentVersion(name).map(v => new Path(tableDir(name), v))
        val df = spark.read.parquet((base.toSeq ++ segs).map(_.toString): _*)
        overwriteFolding(name, df, Nil, segs)
        true
      }
    }

  def dropTable(name: String): Unit = {
    val dir = tableDir(name)
    val f = fs(dir)
    if (f.exists(dir)) f.delete(dir, true)
  }

  /** Remove version directories other than the current one plus any stale
    * uncommitted temp dirs a crashed writer left behind (vacuum).
    */
  override def vacuum(name: String): Unit = {
    currentVersion(name).foreach { cur =>
      val dir = tableDir(name)
      val f = fs(dir)
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if ((n.startsWith("v_") && n != cur) ||
            n.startsWith(".tmp_") || n.startsWith("._VERSION.tmp"))
          f.delete(st.getPath, true)
      }
    }
  }
}
