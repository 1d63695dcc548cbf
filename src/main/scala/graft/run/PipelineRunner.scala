package graft.run

import graft.core._
import graft.operators.{Audit, Publish, Validator}
import graft.sources.{ExcelReader, Reader, ReaderFactory}
import graft.store.{Schemas, TableStore}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Outcome of processing one file (reference returns `(success, file,
  * error_name)` tuples, src/pipeline/runner.py:213-272).
  */
final case class FileResult(
    success: Boolean,
    fileName: String,
    errorName: Option[String],
    logId: Long,
    recordsRead: Long = 0,
    recordsFailedValidation: Long = 0,
    publishInserts: Long = 0,
    publishUpdates: Long = 0)

/** The per-file 7-stage pipeline (reference src/pipeline/runner.py:42-275):
  *
  *   dup-file check -> archive -> READ -> VALIDATE -> WRITE(stage+DLQ)
  *   -> AUDIT -> PUBLISH(merge) -> DLQ-cleanup -> cleanup/drop
  *
  * The reference's thread-per-file, single-threaded-within-file model is
  * inverted (SURVEY §4): each stage here is a distributed Spark job over the
  * file's partitions, and the whole read->validate->split is ONE cached plan
  * (the reference's fused generator pipeline becomes whole-stage codegen).
  *
  * Error routing preserves the reference's quirk (runner.py:229-268): a
  * [[FileError]] on a source with configured notification emails sends the
  * email and the file counts as a SUCCESS result.
  */
final class PipelineRunner(
    spark: SparkSession,
    store: TableStore,
    files: FileOps,
    notifier: Notifier,
    /** Where published TARGETS live (K5 writer dispatch: the reference picks
      * a DB writer per deployment, write/factory.py:13-43). Run metadata —
      * log, DLQ, filename sidecars — always stays in the parquet store.
      */
    targetSink: graft.store.Sink = null) {

  private val sink: graft.store.Sink = Option(targetSink).getOrElse(store)

  def run(path: String, source: SourceConfig): FileResult = {
    val fileName = FileUtils.bareName(path)
    val logId = store.nextId()
    // Per-stage log events buffer on the driver and flush as ONE segment
    // append per file — per-event table writes would add a Spark job per
    // stage (and at scale, a quadratic log-rewrite; see TableStore.append).
    logBuffer.set(Vector.empty)
    log(logId, fileName, Some(source.tableName), "start", success = None)
    // Only delete the drop file once a copy exists elsewhere: an engine /
    // environment failure BEFORE the archive copy must never destroy the
    // user's only copy. (Safety improvement over the reference, whose
    // finally deletes unconditionally, runner.py:270.)
    var safeToDelete = false
    try {
      graft.core.Trace.withJobDesc(spark, s"pipeline:dup-probe $fileName") {
        checkDuplicate(fileName, source)
      }
      files.archive(path) // copy-before-processing (runner.py:142-149)
      safeToDelete = true
      val result = runStages(path, fileName, source, logId)
      log(logId, fileName, Some(source.tableName), "complete", success = Some(true),
        read = result.recordsRead, failed = result.recordsFailedValidation,
        inserts = result.publishInserts, updates = result.publishUpdates)
      result
    } catch {
      case e: DuplicateFileError =>
        // not an error: move to duplicates dir and skip (runner.py:127-140)
        files.moveToDuplicates(path)
        safeToDelete = true // moved (delete is a guarded no-op)
        log(logId, fileName, Some(source.tableName), "duplicate", success = Some(true))
        FileResult(success = true, fileName, Some(e.errorName), logId)
      case e: FileError =>
        log(logId, fileName, Some(source.tableName), "error", success = Some(false),
          errorName = Some(e.errorName), errorMessage = Some(e.getMessage))
        if (source.notificationEmails.nonEmpty) {
          notifier.notifyFileError(source.notificationEmails, fileName, e)
          // email-sent => success (reference runner.py:246-251)
          FileResult(success = true, fileName, Some(e.errorName), logId)
        } else FileResult(success = false, fileName, Some(e.errorName), logId)
    } finally {
      flushLog()
      if (safeToDelete) files.deleteFromDrop(path)
    }
  }

  /** P6 duplicate-file predicate: by source_filename in the TARGET table —
    * content-identical renamed files reload (reference db_utils.py:243-258).
    * The probe reads the tiny __filenames sidecar (backfilled from the
    * target on the first post-sidecar publish, then appended on every
    * publish), NOT the target: at 100 TB a per-file full-target scan is
    * the difference between O(files-loaded) and O(data).
    */
  private def checkDuplicate(fileName: String, source: SourceConfig): Unit = {
    val sidecar = s"${source.tableName}__filenames"
    val names =
      if (store.exists(sidecar)) store.readIfExists(sidecar)
        .map(_.select("source_filename"))
      else sink.readIfExists(source.tableName)
        .map(_.select("source_filename").distinct())
    names.foreach { n =>
      if (!n.filter(col("source_filename") === fileName).isEmpty)
        throw DuplicateFileError(fileName, source.tableName)
    }
  }

  private def runStages(path: String, fileName: String, source: SourceConfig,
                        logId: Long): FileResult = {
    val sidecar = s"${source.tableName}__filenames"
    val reader = ReaderFactory.readerFor(fileName)
    val raw = graft.core.Trace.span("read", "file" -> fileName)(
      graft.core.Trace.withJobDesc(spark, s"pipeline:read $fileName")(
        reader.read(spark, path, source)))
    log(logId, fileName, Some(source.tableName), "read", success = Some(true))

    // Validate the UNNUMBERED frame first, without the DLQ JSON payload —
    // clean files (the common case at scale) pay neither the zipWithIndex
    // numbering pass nor a to_json over every row. Files with errors
    // re-validate over the numbered frame with payloads enabled so DLQ
    // records carry real file_row_numbers and file_record_data.
    // A single-file drop often scans as one task (one parquet row group /
    // one CSV split): fan the validation out across the cluster when the
    // scan itself can't. Only fires on under-partitioned reads — large
    // multi-split files keep their native layout, no gratuitous shuffle.
    // Parallelism comes from graft.core.ScanEstimate (parquet footer
    // row-group counts; gzip = 1 task; otherwise one task per 128 MB) —
    // `df.rdd.getNumPartitions` forced a full logical→RDD plan conversion
    // per file on this hot path.
    val par = spark.sparkContext.defaultParallelism
    val estTasks =
      try graft.core.ScanEstimate.effectiveTasks(
        spark.sparkContext.hadoopConfiguration, path)
      catch { case _: java.io.IOException => par.toLong }
    val validationInput =
      if (estTasks * 2 <= par) raw.df.repartition(par)
      else raw.df
    val vr = graft.core.Trace.span("validate", "file" -> fileName)(
      graft.core.Trace.withJobDesc(spark, s"pipeline:validate $fileName")(
        Validator.validate(validationInput, source, fileName, logId,
          excelDates = reader.isInstanceOf[ExcelReader],
          withRawRecord = false)))
    var vrNumbered: Option[graft.operators.ValidationResult] = None
    try {
      // WRITE: DLQ rows always persist (even below-threshold successes keep
      // their DLQ rows, reference test_csv.py:100-131).
      if (vr.errorCount > 0) {
        val vrN = {
          val n = Validator.validate(raw.numbered(), source, fileName, logId,
            excelDates = reader.isInstanceOf[ExcelReader])
          vrNumbered = Some(n)
          n
        }
        val now = new java.sql.Timestamp(System.currentTimeMillis())
        val dlqRows = vrN.dlq.select(
          col("source_filename"),
          col("file_row_number"),
          col(Validator.RawRecordCol).as("file_record_data"),
          to_json(col(Validator.ErrorsCol)).as("validation_errors"),
          col("file_load_log_id"),
          lit(source.tableName).as("target_table_name"),
          lit(now).as("failed_at"))
        // locked: a concurrent DLQ-cleanup overwrite snapshots-and-deletes
        // segments — an unlocked append could land in that window and be
        // dropped
        graft.core.Trace.withJobDesc(spark, s"pipeline:dlq-write $fileName") {
          store.withTableLock(Schemas.DlqTable) {
            store.append(Schemas.DlqTable, dlqRows)
          }
        }
        log(logId, fileName, Some(source.tableName), "write", success = Some(true),
          read = vr.totalCount, failed = vr.errorCount)
        Validator.gate(vrN, source, fileName) // gate AFTER the DLQ write
      } else {
        log(logId, fileName, Some(source.tableName), "write", success = Some(true),
          read = vr.totalCount, failed = vr.errorCount)
      }

      val stage = vr.valid.drop(Validator.ErrorsCol, Validator.IsValidCol,
        Validator.RawRecordCol, "file_row_number")

      // AUDIT (A1/A2 grain, A3 custom) on staged rows — independent jobs,
      // submitted concurrently so the scheduler overlaps them
      graft.core.Trace.span("audit", "file" -> fileName) {
        graft.core.Trace.withJobDesc(spark, s"pipeline:audit $fileName") {
          Audit.runAll(spark, stage, source, fileName)
        }
      }
      log(logId, fileName, Some(source.tableName), "audit", success = Some(true))

      // PUBLISH: merge upsert + atomic swap. The read->merge->swap sequence
      // holds the per-table lock: two files publishing into the same target
      // concurrently would otherwise both read the old version and the last
      // swap would drop the other's rows. Different targets publish in
      // parallel; the reference got this serialization for free from the
      // database's MERGE.
      val (mInserts, mUpdates) =
          graft.core.Trace.span("publish", "file" -> fileName,
            "table" -> source.tableName) {
          graft.core.Trace.withJobDesc(spark,
            s"pipeline:publish ${source.tableName}") {
        store.withTableLock(source.tableName) {
        val now = new java.sql.Timestamp(System.currentTimeMillis())
        // one-time sidecar backfill for tables populated before the sidecar
        // existed — otherwise filenames loaded pre-sidecar would stop being
        // detected as duplicates once the sidecar appears
        if (!store.exists(sidecar)) sink.readIfExists(source.tableName).foreach { t =>
          store.append(sidecar, t.select(col("source_filename")).distinct()
            .withColumn("file_load_log_id", lit(-1L))
            .withColumn("published_at", lit(now)))
        }
        // record the filename in the probe sidecar (atomic segment append)
        def appendSidecar(): Unit = {
          val sp = spark
          import sp.implicits._
          graft.core.Trace.withJobDesc(spark,
            s"pipeline:sidecar-append ${source.tableName}") {
            store.append(sidecar, Seq((fileName, logId, now))
              .toDF("source_filename", "file_load_log_id", "published_at"))
          }
        }
        // backends with a native MERGE (JDBC) publish O(delta) in place;
        // otherwise read -> Spark-side merge -> overwrite, with counts
        // observed during the overwrite's own write job (no separate cached
        // count pass) and first publishes skipping the merge join entirely
        val cnt = sink.mergeInPlace(source.tableName, stage, source, now) match {
          case Some(c) =>
            appendSidecar()
            c
          case None =>
            val existing = sink.readIfExists(source.tableName)
            val target = existing.getOrElse(Publish.emptyTarget(spark, source))
            val m = Publish.mergePlan(stage, target, source, now,
              targetKnownEmpty = existing.isEmpty)
            sink.overwrite(source.tableName, m.merged, source.targetPartitionBy)
            // post-write housekeeping: the vacuum (a driver-side FS
            // metadata walk dropping superseded versions) and the sidecar
            // append (one small Spark write job) are INDEPENDENT — overlap
            // them (guide §2.6) instead of serializing two latency-bound
            // steps. Crash domains unmerged: each keeps its own failure,
            // both are awaited, and neither orders against the other —
            // the version swap inside overwrite() remains the commit
            // point, exactly as before.
            graft.operators.Audit.inParallel(spark)(
              sink.vacuum(source.tableName),
              appendSidecar())
            m.counts()
        }
        cnt
      } } }
      log(logId, fileName, Some(source.tableName), "publish", success = Some(true),
        inserts = mInserts, updates = mUpdates)
      // post-publish housekeeping, overlapped (guide §2.6): the layout
      // gauge (a manifest read on the TARGET; upgrades a target pinned to
      // a tiny first file's bucket count once it outgrows the sizing rule
      // 8x) and the DLQ cleanup (a probe + conditional rewrite of the
      // DLQ TABLE) touch different tables, hold different locks, and
      // neither orders against the other — only their combined completion
      // gates the file's result. Failure domains stay separate: each arm
      // keeps its own lock scope and rethrows independently.
      graft.operators.Audit.inParallel(spark)(
        graft.core.Trace.withJobDesc(spark,
          s"pipeline:rebucket-gauge ${source.tableName}") {
          sink.maybeRebucket(source.tableName, source.grain).foreach(n =>
            System.err.println(
              s"${source.tableName}: rebucketed outgrown layout to $n buckets"))
        },
        // DLQ cleanup: drop THIS file's rows from EARLIER runs only; the
        // current run's rows survive (reference delete/base.py:36-41).
        // Probe before rewriting: the common case — a clean file, or a
        // file loaded for the first time — has nothing to delete, and the
        // probe is one scan with the filename filter pushed to the parquet
        // row groups, where the unconditional rewrite paid an O(DLQ) write
        // on EVERY publish regardless.
        graft.core.Trace.withJobDesc(spark, s"pipeline:dlq-cleanup $fileName") {
          store.withTableLock(Schemas.DlqTable) {
            store.readIfExists(Schemas.DlqTable).foreach { dlq =>
              val stale = col("source_filename") === fileName &&
                col("file_load_log_id") < logId
              if (!dlq.filter(stale).isEmpty) {
                store.overwrite(Schemas.DlqTable, dlq.filter(!stale))
                store.vacuum(Schemas.DlqTable)
              }
            }
          }
        })

      FileResult(success = true, fileName, None, logId,
        recordsRead = vr.totalCount,
        recordsFailedValidation = vr.errorCount,
        publishInserts = mInserts,
        publishUpdates = mUpdates)
    } finally {
      vr.all.unpersist()
      vrNumbered.foreach(_.all.unpersist())
    }
  }

  // buffered per-run log events; ThreadLocal because the Processor's file
  // pool runs one file per thread on a SHARED runner instance
  private val logBuffer =
    ThreadLocal.withInitial[Vector[Row]](() => Vector.empty)

  private def log(logId: Long, fileName: String, table: Option[String],
                  stage: String, success: Option[Boolean],
                  read: Long = -1, failed: Long = -1,
                  inserts: Long = -1, updates: Long = -1,
                  errorName: Option[String] = None,
                  errorMessage: Option[String] = None): Unit = {
    val row = Row(
      logId, fileName, table.orNull, stage,
      new java.sql.Timestamp(System.currentTimeMillis()),
      success.map(Boolean.box).orNull,
      if (read >= 0) Long.box(read) else null,
      if (read >= 0) Long.box(read) else null, // records_written_to_stage: counts DLQ rows too (reference write/base.py:84,123)
      if (failed >= 0) Long.box(failed) else null,
      if (inserts >= 0) Long.box(inserts) else null,
      if (updates >= 0) Long.box(updates) else null,
      errorName.orNull, errorMessage.orNull)
    logBuffer.set(logBuffer.get() :+ row)
  }

  private def flushLog(): Unit = {
    val rows = logBuffer.get()
    if (rows.nonEmpty) {
      import scala.jdk.CollectionConverters._
      graft.core.Trace.withJobDesc(spark, "pipeline:log-append") {
        store.append(Schemas.LogTable,
          spark.createDataFrame(rows.asJava, Schemas.LogSchema))
      }
      logBuffer.set(Vector.empty)
    }
  }
}
