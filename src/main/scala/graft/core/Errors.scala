package graft.core

/** Error taxonomy of the engine.
  *
  * Mirrors the semantics of the reference's exception hierarchy
  * (reference: src/exception/exceptions.py:6-125, src/exception/base.py:6-13):
  * a closed set of *file-level* errors that are user-visible / emailable,
  * versus internal errors that indicate engine bugs or environment failures.
  *
  * A [[FileError]] carries everything a notification needs: the file name and
  * a human-readable detail. The pipeline's error routing (email-sent implies
  * run-success, reference src/pipeline/runner.py:229-268) keys off this trait.
  */
/** Error-formatting helpers shared by notification and logging paths. */
object Errors {
  /** Deepest in-engine stack frame of a failure, formatted
    * `File.scala:123 in method` — the Scala equivalent of the reference's
    * traceback-tail formatting (src/utils.py:45-54), so a logged or emailed
    * internal error pinpoints its origin without shipping the whole stack.
    */
  def location(e: Throwable): String =
    e.getStackTrace.find(_.getClassName.startsWith("graft."))
      .map(f => s"${f.getFileName}:${f.getLineNumber} in ${f.getMethodName}")
      .getOrElse("unknown")
}

sealed abstract class FileError(val errorName: String, message: String)
    extends RuntimeException(message) {
  def fileName: String
}

/** File has no header row / all-blank header (reference exceptions.py MissingHeaderError). */
final case class MissingHeaderError(fileName: String)
    extends FileError("MissingHeaderError", s"No header found in file: $fileName")

/** Required model columns absent from the file header (reference MissingColumnsError). */
final case class MissingColumnsError(fileName: String, missing: Seq[String])
    extends FileError(
      "MissingColumnsError",
      s"File $fileName is missing required columns: ${missing.sorted.mkString(", ")}")

/** File matched a source but contains zero data rows (reference NoDataInFileError).
  * `detail` carries the WHY when known (e.g. the configured json array_path
  * the file lacks) so the notification is actionable for persistent
  * config-vs-content mismatches, not just one bad file.
  */
final case class NoDataInFileError(fileName: String, detail: String = "")
    extends FileError("NoDataInFileError",
      s"No data found in file: $fileName" +
        (if (detail.nonEmpty) s" ($detail)" else ""))

/** Validation error rate >= source threshold (reference ValidationThresholdExceededError).
  * Note the gate is `>=`: the default threshold 0.0 fails on any error
  * (reference src/pipeline/validate/validator.py:149-169).
  */
final case class ValidationThresholdExceededError(
    fileName: String,
    errorCount: Long,
    totalCount: Long,
    threshold: Double,
    sampleErrors: Seq[String])
    extends FileError(
      "ValidationThresholdExceededError",
      s"File $fileName exceeded validation error threshold: " +
        s"$errorCount/$totalCount errors (threshold=$threshold). " +
        s"Sample: ${sampleErrors.mkString("; ")}")

/** Stage data violates grain uniqueness (reference GrainValidationError). */
final case class GrainValidationError(
    fileName: String,
    grain: Seq[String],
    duplicateExamples: Seq[String])
    extends FileError(
      "GrainValidationError",
      s"File $fileName has duplicate grain (${grain.mkString(", ")}). " +
        s"Examples: ${duplicateExamples.mkString("; ")}")

/** One or more custom audit columns evaluated to zero (reference AuditFailedError). */
final case class AuditFailedError(fileName: String, failedAudits: Seq[String])
    extends FileError(
      "AuditFailedError",
      s"File $fileName failed audits: ${failedAudits.mkString(", ")}")

/** File already loaded into the target (probe by source_filename,
  * reference src/pipeline/db_utils.py:243-258). Routed to the duplicates dir,
  * not emailed (reference runner.py:127-140).
  */
final case class DuplicateFileError(fileName: String, targetTable: String)
    extends FileError(
      "DuplicateFileError",
      s"File $fileName already loaded into $targetTable")

/** More than one registered source matches a filename
  * (reference src/sources/registry.py:41-53).
  */
final case class MultipleSourcesMatchError(fileName: String, sources: Seq[String])
    extends RuntimeException(
      s"File $fileName matches multiple sources: ${sources.mkString(", ")}")

/** Unsupported file extension (reference src/pipeline/read/factory.py:35-48). */
final case class UnsupportedFileTypeError(fileName: String, extension: String)
    extends RuntimeException(s"Unsupported file type '$extension' for $fileName")
