package graft.operators

import graft.core._
import graft.sources.Reader
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result of validating one file's rows. All three frames share one cached
  * plan; `valid`/`dlq` are filters over `all` (the reference's tagged-row
  * union stream, validator.py:97-148, split at write/base.py:50-75).
  */
final case class ValidationResult(
    all: DataFrame,
    valid: DataFrame,
    dlq: DataFrame,
    totalCount: Long,
    errorCount: Long) {
  def errorRate: Double = if (totalCount == 0) 0.0 else errorCount.toDouble / totalCount
}

/** The typed-filter core (reference src/pipeline/validate/validator.py:97-148).
  *
  * Compiles a [[SourceConfig]]'s column specs into ONE projection producing:
  *   - every target column cleaned + cast to its declared type,
  *   - `_errors  array<struct<column_name,column_value,error_type,error_message>>`,
  *   - `is_valid = (size(_errors) = 0)`,
  *   - `etl_row_hash` — xxhash64 over the *sorted* model fields joined with
  *     "|", nulls as "" (reference db_utils.py:278-289; sorted keys
  *     model_utils.py:125-126). The reference uses xxh128; 64-bit preserves
  *     the change-detection semantics (SURVEY §7.3) and is a codegen'd
  *     built-in.
  *   - `file_record_data` — JSON of the raw pre-cast record for DLQ payloads
  *     (reference db_utils.py:261-275).
  *
  * Everything is `Column` expressions — no UDFs — so the whole validation
  * stays inside whole-stage codegen and scales linearly with partitions.
  */
object Validator {

  val ErrorsCol = "_errors"
  val IsValidCol = "is_valid"
  val RawRecordCol = "file_record_data"

  private val errorStruct = (colName: String, value: Column, errType: String, msg: Column) =>
    struct(
      lit(colName).as("column_name"),
      value.cast(StringType).as("column_value"),
      lit(errType).as("error_type"),
      msg.as("error_message"))

  /** Excel serial epoch: 1899-12-30 (reference excel.py:21-23). */
  private val ExcelEpochDays = lit(java.sql.Date.valueOf("1899-12-30"))
  private val ExcelEpochSecs = -2209161600L
  private val NumericRe = "^-?\\d+(\\.\\d+)?$"

  /** Cleaned (pre-cast) expression for a spec. */
  private def cleaned(spec: ColumnSpec): Column =
    spec.cleaners.foldLeft(col(spec.name))((c, f) => f(c))

  /** Cast with try semantics plus the Excel-serial date path when enabled
    * (reference excel.py:62-84: serial days/fractional-seconds against the
    * 1899-12-30 epoch).
    */
  private def castExpr(raw: Column, dt: DataType, excelDates: Boolean): Column = {
    val direct = raw.try_cast(dt)
    if (!excelDates) direct
    else {
      // Numeric cells MUST take the serial path first: Spark would otherwise
      // "successfully" parse "45306" as the year 45306.
      val isSerial = raw.cast(StringType).rlike(NumericRe)
      dt match {
        case DateType =>
          val serial = raw.try_cast(DoubleType)
          when(isSerial && serial.isNotNull,
            date_add(ExcelEpochDays, floor(serial).cast(IntegerType)))
            .otherwise(direct)
        case TimestampType =>
          val serial = raw.try_cast(DoubleType)
          when(isSerial && serial.isNotNull,
            timestamp_seconds(lit(ExcelEpochSecs) + (serial * 86400.0).cast(LongType)))
            .otherwise(direct)
        case _ => direct
      }
    }
  }

  /** Build the full validation projection over a raw read.
    *
    * `withRawRecord = false` omits the `file_record_data` JSON payload —
    * a to_json over every pre-cast column that only DLQ records ever read.
    * The happy-path validation pass (clean files, the common case at scale)
    * skips it and caches a materially smaller frame; error files take a
    * second pass with payloads (and row numbers) enabled.
    */
  def compile(raw: DataFrame, source: SourceConfig, fileName: String,
              logId: Long, excelDates: Boolean = false,
              withRawRecord: Boolean = true): DataFrame = {
    val specs = source.columns

    // P1 alias rename + projection: unmapped file columns drop here
    // (reference model_utils.py:6-13,26-33).
    val present = raw.columns.toSet
    // file_row_number is optional on input: the happy path validates an
    // unnumbered frame (no zipWithIndex pass) and only error files get
    // re-validated with real numbers for DLQ records
    val rowNum = if (present.contains(Reader.RowNumCol)) col(Reader.RowNumCol)
                 else lit(-1L)
    val aliased = raw.select(
      specs.map(s => (if (present.contains(s.fileAlias)) col(s.fileAlias)
                      else lit(null).cast(StringType)).as(s.name)) :+
        rowNum.as("file_row_number"): _*)

    val rawRecord =
      if (withRawRecord) Seq(to_json(struct(specs.map(s => col(s.name)): _*)).as(RawRecordCol))
      else Seq.empty[Column]

    // Per-spec: cleaned -> cast, with every violated rule contributing one
    // error struct. array(...) of conditional nulls -> filter = compact.
    val castCols = specs.map { s =>
      castExpr(cleaned(s), s.dataType, excelDates).as(s.name)
    }
    val errorExprs: Seq[Column] = specs.flatMap { s =>
      val c = cleaned(s)
      val casted = castExpr(c, s.dataType, excelDates)
      val typeErr = when(c.isNotNull && casted.isNull,
        errorStruct(s.name, c, "type_error",
          lit(s"value is not a valid ${s.dataType.simpleString}")))
      val nullErr = if (s.nullable) lit(null) else when(c.isNull,
        errorStruct(s.name, c, "missing",
          lit("field required")))
      val lenErr = s.maxLength.map(n => when(casted.cast(StringType).isNotNull &&
          length(casted.cast(StringType)) > n,
        errorStruct(s.name, c, "string_too_long",
          lit(s"string should have at most $n characters")))).getOrElse(lit(null))
      val emailErr = if (!s.email) lit(null) else when(casted.isNotNull &&
          !casted.rlike(ColumnSpec.EmailRegex),
        errorStruct(s.name, c, "value_error",
          lit("value is not a valid email address")))
      val customErr = s.check.map { case (label, fn) => when(casted.isNotNull &&
          !fn(casted),
        errorStruct(s.name, c, "value_error", lit(label)))
      }.getOrElse(lit(null))
      Seq(typeErr, nullErr, lenErr, emailErr, customErr)
    }
    val errorsArr = filter(array(errorExprs: _*), e => e.isNotNull).as(ErrorsCol)

    val projected = aliased.select(
      castCols ++ Seq(col("file_row_number")) ++ rawRecord ++ Seq(errorsArr): _*)

    // V4 row hash over sorted model fields (applied to the CAST values; the
    // reference hashes the validated/coerced record, validator.py:110-112).
    val sortedFields = specs.map(_.name).sorted
    val hashInput = concat_ws("|",
      sortedFields.map(f => coalesce(col(f).cast(StringType), lit(""))): _*)

    projected
      .withColumn(IsValidCol, size(col(ErrorsCol)) === 0)
      .withColumn("etl_row_hash", xxhash64(hashInput))
      .withColumn("source_filename", lit(fileName))
      .withColumn("file_load_log_id", lit(logId))
  }

  /** Run validation, cache, count, apply the threshold gate.
    *
    * The gate is `error_rate >= threshold` — the default 0.0 fails on ANY
    * error; a rate strictly below the threshold passes and still writes its
    * DLQ rows (reference validator.py:149-169, test_csv.py:100-131). On
    * failure the first 5 errors in file order are sampled for the message
    * (validator.py:131-138).
    */
  def validate(raw: DataFrame, source: SourceConfig, fileName: String,
               logId: Long, excelDates: Boolean = false,
               withRawRecord: Boolean = true): ValidationResult = {
    val all = compile(raw, source, fileName, logId, excelDates, withRawRecord).cache()
    val counts = all.agg(
      count(lit(1)).as("total"),
      count(when(!col(IsValidCol), 1)).as("errors")).head()
    val (total, errors) = (counts.getLong(0), counts.getLong(1))
    val valid = all.filter(col(IsValidCol))
    val dlq = all.filter(!col(IsValidCol))
    ValidationResult(all, valid, dlq, total, errors)
  }

  /** Throws [[ValidationThresholdExceededError]] when the gate trips. */
  def gate(result: ValidationResult, source: SourceConfig, fileName: String): Unit = {
    if (result.totalCount > 0 && result.errorRate >= source.validationErrorThreshold &&
        result.errorCount > 0) {
      val sample = result.dlq
        .orderBy("file_row_number")
        .select(col("file_row_number"), to_json(col(ErrorsCol)).as("errs"))
        .limit(5).collect()
        .map(r => s"row ${r.getLong(0)}: ${r.getString(1)}")
      throw ValidationThresholdExceededError(
        fileName, result.errorCount, result.totalCount,
        source.validationErrorThreshold, sample.toSeq)
    }
  }
}
