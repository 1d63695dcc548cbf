package graft.run

import graft.core.{FileError, Retry}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/** Driver-side file lifecycle ops over the Hadoop FileSystem API — one code
  * path for file://, s3a://, abfss://, gs:// (the reference carries four
  * separate helpers: src/file_helper/file_helper.py, aws_file_helper.py,
  * azure_file_helper.py, gcp_file_helper.py).
  *
  * Semantics (reference src/file_helper/file_helper.py:38-79):
  *  - archive: COPY to the archive dir before processing
  *  - duplicates: MOVE with a timestamp-suffix rename on collision
  *  - delete: remove from the drop dir (runner's `finally`)
  */
final class FileOps(conf: Configuration, archiveDir: String,
                    duplicatesDir: String) {

  private def fs(p: Path) =
    try p.getFileSystem(conf)
    catch {
      // a missing connector jar fails cryptically ("No FileSystem for
      // scheme" / "Class ...S3AFileSystem not found"); rethrow with the
      // deploy fix (which jar, where creds go)
      case e @ (_: java.io.IOException | _: RuntimeException) =>
        graft.core.CloudCredentials.missingConnectorHint(e) match {
          case Some(hint) => throw new java.io.IOException(hint, e)
          case None => throw e
        }
    }

  def archive(path: String): Unit = Retry.withBackoff() {
    val src = new Path(path)
    val dstDir = new Path(archiveDir)
    val f = fs(src)
    f.mkdirs(dstDir)
    val dst = new Path(dstDir, src.getName)
    FileUtil.copy(f, src, fs(dst), dst, false, true, conf)
  }

  def moveToDuplicates(path: String): Unit = Retry.withBackoff() {
    val src = new Path(path)
    val f = fs(src)
    if (!f.exists(src)) return
    val dstDir = new Path(duplicatesDir)
    f.mkdirs(dstDir)
    var dst = new Path(dstDir, src.getName)
    if (fs(dst).exists(dst)) { // collision: timestamp suffix (file_helper.py:59-66)
      val n = src.getName
      val dot = n.indexOf('.')
      val (base, ext) = if (dot >= 0) (n.substring(0, dot), n.substring(dot)) else (n, "")
      dst = new Path(dstDir, s"${base}_${System.currentTimeMillis()}$ext")
    }
    FileUtil.copy(f, src, fs(dst), dst, true, true, conf)
  }

  def deleteFromDrop(path: String): Unit = Retry.withBackoff() {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, false)
  }

  /** S7 directory scan: list the drop dir, skip dotfiles
    * (reference file_helper.py:24-35).
    */
  def scanDirectory(dir: String): Seq[String] = Retry.withBackoff() {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .sorted
  }
}

/** Notification seam (reference src/notify/email.py, webhook.py): the engine's error routing
  * depends on notifications being *attempted*; transport is pluggable. The
  * default collects messages in memory (tests assert on it); an SMTP/webhook
  * transport drops in behind the same trait.
  */
trait Notifier {
  def notifyFileError(recipients: Seq[String], fileName: String, error: FileError): Unit
  def notifySummary(summary: String): Unit
}

final class CollectingNotifier extends Notifier {
  val fileErrors = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], String, String)]
  val summaries = scala.collection.mutable.ArrayBuffer.empty[String]
  override def notifyFileError(recipients: Seq[String], fileName: String,
                               error: FileError): Unit = synchronized {
    fileErrors += ((recipients, fileName, error.errorName))
  }
  override def notifySummary(summary: String): Unit = synchronized {
    summaries += summary
  }
}
