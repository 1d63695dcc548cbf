package graft.run

import graft.core.{FileError, Retry}

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** SMTP notifier (reference src/notify/email.py:15-105): per-error failure
  * emails to the source's `notification_emails`, CC'd to the data-team
  * address when configured.
  *
  * Transport is a minimal RFC 5321 client over a plain socket (HELO /
  * MAIL FROM / RCPT TO / DATA / QUIT with dot-stuffing) — the engine has no
  * mail dependency on its classpath and needs exactly one message shape.
  * Matches the reference's template: subject
  * `FileLoader Failed: <file> - <ErrorType>`, body with File / Error Type /
  * Error Details sections (email.py:52-66).
  *
  * Sends are retried with backoff then DROPPED with a stderr note — a
  * notification failure must never fail a file run (email.py:99-105 catches
  * everything after retries). The pipeline's email⇒success routing only
  * requires the attempt.
  */
final class EmailNotifier(
    host: String,
    port: Int,
    fromEmail: String,
    ccEmail: Option[String] = None,
    timeoutMs: Int = 10000) extends Notifier {

  /** Header values must be single-line: a CR/LF smuggled through a filename
    * or error name would otherwise inject extra SMTP headers.
    */
  private def headerSafe(s: String): String = s.replaceAll("[\\r\\n]+", " ")

  override def notifyFileError(recipients: Seq[String], fileName: String,
                               error: FileError): Unit = {
    val subject = headerSafe(s"FileLoader Failed: $fileName - ${error.errorName}")
    val body =
      s"""File Processing Failure Notification
         |
         |File: $fileName
         |Error Type: ${error.errorName}
         |
         |Error Details:
         |${error.getMessage}""".stripMargin
    send(recipients, subject, body)
  }

  override def notifySummary(summary: String): Unit = () // reference emails only failures

  private def send(recipients: Seq[String], subject: String, body: String): Unit =
    try Retry.withBackoff() {
      val all = recipients ++ ccEmail.toSeq
      val socket = new Socket(host, port)
      socket.setSoTimeout(timeoutMs)
      try {
        val in = new BufferedReader(new InputStreamReader(
          socket.getInputStream, StandardCharsets.US_ASCII))
        val out = new OutputStreamWriter(
          socket.getOutputStream, StandardCharsets.US_ASCII)
        expect(in, "220")
        command(in, out, s"HELO graft.local", "250")
        command(in, out, s"MAIL FROM:<$fromEmail>", "250")
        all.foreach(r => command(in, out, s"RCPT TO:<$r>", "250"))
        command(in, out, "DATA", "354")
        val headers = Seq(
          s"From: $fromEmail",
          s"To: ${recipients.mkString(", ")}") ++
          ccEmail.map(cc => s"Cc: $cc").toSeq ++ Seq(
          s"Subject: $subject",
          "MIME-Version: 1.0",
          "Content-Type: text/plain; charset=utf-8",
          "")
        (headers ++ body.split("\n", -1).toSeq).foreach { line =>
          // dot-stuffing (RFC 5321 §4.5.2): a leading '.' would end DATA
          out.write((if (line.startsWith(".")) "." + line else line) + "\r\n")
        }
        out.write(".\r\n"); out.flush()
        expect(in, "250")
        command(in, out, "QUIT", "221")
      } finally socket.close()
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft] email notify failed (dropped): $e")
    }

  private def command(in: BufferedReader, out: Writer, line: String,
                      expectCode: String): Unit = {
    out.write(line + "\r\n"); out.flush()
    expect(in, expectCode)
  }

  /** Read one (possibly multi-line, `NNN-`) SMTP reply; fail unless NNN matches. */
  private def expect(in: BufferedReader, code: String): Unit = {
    var line = in.readLine()
    while (line != null && line.length >= 4 && line.charAt(3) == '-')
      line = in.readLine()
    if (line == null || !line.startsWith(code))
      throw new java.io.IOException(s"SMTP expected $code, got: $line")
  }
}
