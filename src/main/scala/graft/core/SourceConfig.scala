package graft.core

import java.nio.file.FileSystems

/** Per-format read options (reference: src/sources/base.py:41-57 — CSVConfig,
  * ExcelConfig, JSONConfig subclasses of DataSource).
  */
sealed trait FormatOptions
final case class CsvOptions(
    delimiter: String = ",",
    encoding: String = "UTF-8",
    skipRows: Int = 0) extends FormatOptions
final case class ExcelOptions(
    sheetName: Option[String] = None,
    skipRows: Int = 0) extends FormatOptions
final case class JsonOptions(
    /** Dotted path to the record array inside the document, e.g.
      * "entries.item" (reference src/sources/systems/financial/financial.py:25).
      */
    arrayPath: Option[String] = None) extends FormatOptions
case object ParquetOptions extends FormatOptions

/** A registered source configuration: which files it claims, their schema +
  * rules, where rows land, and the audit contract.
  *
  * Mirrors the reference's `DataSource` (src/sources/base.py:11-38):
  * file_pattern (glob), source model, table_name, grain, audit_query,
  * validation_error_threshold, notification_emails.
  *
  * @param name         unique registry key
  * @param filePattern  case-insensitive glob matched against the bare filename
  * @param sourceType   file format this source reads ("csv" | "excel" | "json"
  *                     | "parquet"); filters registry matches the same way the
  *                     reference filters on the reader's SOURCE_TYPE
  *                     (src/sources/registry.py:21-39)
  * @param columns      the table model
  * @param tableName    target table name
  * @param grain        key columns; must be non-empty and subset of columns
  * @param auditQuery   optional SQL with a `{table}` placeholder; every result
  *                     column of its single row must be non-zero
  *                     (reference src/pipeline/audit/base.py:95-121)
  * @param validationErrorThreshold fail the file iff error_rate >= threshold
  *                     (note `>=`: default 0.0 fails on any error,
  *                     reference validator.py:149-169)
  * @param notificationEmails recipients for file-level errors; a non-empty
  *                     list flips an emailable failure into a "success" result
  *                     (reference runner.py:232-258)
  * @param targetPartitionBy optional hive-partition columns for the target
  *                     table's versions (e.g. a date column) so selective
  *                     reads prune directories; the reference's equivalent
  *                     was DB table clustering (db.py:103-104)
  * @param mergeOnRead publish strategy for the parquet target. `false`
  *                     (default): bucketed copy-on-write — each publish
  *                     rewrites the buckets the delta touches; reads scan
  *                     plain parquet with zero resolution cost. `true`:
  *                     merge-on-read — each publish writes ONLY the delta
  *                     as an upsert segment (O(delta) regardless of how
  *                     the delta's keys spread across buckets — a
  *                     uniformly-keyed delta touches every bucket and
  *                     degenerates COW to a full rewrite), readers resolve
  *                     latest-by-grain with MERGE timestamp semantics, and
  *                     the store folds segments back into the bucketed
  *                     base past a threshold. The Hudi COW/MOR trade:
  *                     write-heavy targets at 100 TB want `true`.
  */
final case class SourceConfig(
    name: String,
    filePattern: String,
    sourceType: String,
    columns: Seq[ColumnSpec],
    tableName: String,
    grain: Seq[String],
    auditQuery: Option[String] = None,
    validationErrorThreshold: Double = 0.0,
    notificationEmails: Seq[String] = Nil,
    formatOptions: FormatOptions = ParquetOptions,
    targetPartitionBy: Seq[String] = Nil,
    mergeOnRead: Boolean = false) {

  require(grain.nonEmpty, s"source $name: grain must be non-empty")
  require(grain.forall(g => columns.exists(_.name == g)),
    s"source $name: grain ${grain.mkString(",")} not all present in columns")

  /** Case-insensitive glob match on the bare filename
    * (reference src/sources/base.py:31-38 lowercases both sides).
    * `.gz`-compressed files match the pattern of their inner extension too,
    * mirroring the reference's gzip handling (read/factory.py:14-22).
    */
  def matches(fileName: String): Boolean = {
    val matcher = FileSystems.getDefault
      .getPathMatcher("glob:" + filePattern.toLowerCase)
    matcher.matches(java.nio.file.Paths.get(fileName.toLowerCase))
  }

  def requiredAliases: Seq[String] =
    columns.filterNot(_.nullable).map(_.fileAlias)

  def allAliases: Seq[String] = columns.map(_.fileAlias)
}

/** Registry of source configurations with the reference's matching contract
  * (src/sources/registry.py:21-53): zero matches -> None (caller archives and
  * skips), more than one -> [[MultipleSourcesMatchError]].
  */
final class SourceRegistry(sources: Seq[SourceConfig]) {
  require(sources.map(_.name).distinct.size == sources.size,
    "duplicate source names in registry")

  def all: Seq[SourceConfig] = sources

  def findSourceForFile(fileName: String): Option[SourceConfig] = {
    val bare = FileUtils.bareName(fileName)
    val expectedType = FileUtils.sourceTypeOf(bare)
    val hits = sources.filter(s =>
      expectedType.contains(s.sourceType) && s.matches(bare))
    hits match {
      case Seq()  => None
      case Seq(s) => Some(s)
      case many   => throw MultipleSourcesMatchError(fileName, many.map(_.name))
    }
  }
}

/** Filename / extension utilities (reference src/utils.py:57-82): URI-aware
  * bare-name extraction and two-suffix extension handling for `.csv.gz` /
  * `.json.gz`.
  */
object FileUtils {
  private val ExtToType = Map(
    ".csv" -> "csv", ".csv.gz" -> "csv",
    ".json" -> "json", ".json.gz" -> "json",
    ".xlsx" -> "excel", ".xls" -> "excel",
    ".parquet" -> "parquet",
    ".avro" -> "avro",
    ".orc" -> "orc")

  def bareName(path: String): String = {
    val p = path.stripSuffix("/")
    p.substring(p.lastIndexOf('/') + 1)
  }

  /** Extension including the `.gz` double suffix when present. */
  def extensionOf(fileName: String): String = {
    val lower = bareName(fileName).toLowerCase
    val parts = lower.split('.')
    if (parts.length >= 3 && parts.last == "gz") "." + parts.takeRight(2).mkString(".")
    else if (parts.length >= 2) "." + parts.last
    else ""
  }

  def sourceTypeOf(fileName: String): Option[String] =
    ExtToType.get(extensionOf(fileName))

  /** Sanitize a name into a valid SQL/view identifier
    * (reference db_utils.py:43-50): non-alphanumerics -> `_`, prefix guard.
    */
  def sanitizeTableName(raw: String): String = {
    val cleaned = raw.replaceAll("[^a-zA-Z0-9_]", "_")
    if (cleaned.isEmpty || !cleaned.head.isLetter) "t_" + cleaned else cleaned
  }
}
