package graft.core

/** Retry with exponential backoff for driver-side FS/IO operations
  * (reference src/utils.py:19-42: 3 attempts, 0.25 s initial delay, x2
  * backoff, never retrying user-file errors).
  *
  * Executor-side work already has Spark task retries; this wrapper is for
  * the driver's own filesystem calls (archive copies, directory scans,
  * pointer swaps) where a transient object-store hiccup shouldn't fail a
  * whole file run. [[FileError]]s pass through untouched — a malformed user
  * file never gets retried.
  */
object Retry {
  def withBackoff[T](attempts: Int = 3, initialDelayMs: Long = 250)(f: => T): T = {
    var delay = initialDelayMs
    var tries = 0
    while (true) {
      tries += 1
      try return f
      catch {
        case e: FileError => throw e // user-file errors are never transient
        // NonFatal: never swallow/retry ControlThrowable (a non-local
        // `return` inside the by-name block!), OOM, or interrupts
        case e: Throwable if scala.util.control.NonFatal(e) && tries < attempts =>
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Environment-driven engine configuration (reference src/settings.py:23-143:
  * ENV_STATE selects a dev/test/prod prefix for every setting). Settings
  * resolve as `GRAFT_<ENV-STATE>_<KEY>` then `GRAFT_<KEY>` then default,
  * and every resolved value then passes through [[Secrets.resolve]] —
  * a `secret://<scheme>/<ref>` value is replaced by the secret it names
  * (reference settings.py:27-47 resolve_secrets), so DB/SMTP credentials
  * reach the engine without living in plain env vars.
  */
final case class GraftConfig(
    dropDirectory: String,
    archiveDirectory: String,
    duplicatesDirectory: String,
    warehouseDirectory: String,
    filePoolSize: Int,
    /** SMTP transport settings (reference settings.py SMTP_HOST/SMTP_PORT/
      * FROM_EMAIL/DATA_TEAM_EMAIL): email notifications activate only when
      * host AND from are configured — the reference skips sending with a
      * warning otherwise (email.py:44-46,72-74).
      */
    smtpHost: Option[String] = None,
    smtpPort: Int = 25,
    fromEmail: Option[String] = None,
    dataTeamEmail: Option[String] = None,
    /** OTLP/HTTP collector base URL (reference logging_conf.py:37-128 OTel
      * exporter config); spans export when set.
      */
    otelEndpoint: Option[String] = None)

object GraftConfig {
  def load(env: Map[String, String] = sys.env): GraftConfig = {
    val state = env.getOrElse("GRAFT_ENV_STATE", "dev").toUpperCase
    def get(key: String, default: String): String =
      env.get(s"GRAFT_${state}_$key").orElse(env.get(s"GRAFT_$key"))
        .map(Secrets.resolve(_, env))
        .getOrElse(default)
    def opt(key: String): Option[String] =
      env.get(s"GRAFT_${state}_$key").orElse(env.get(s"GRAFT_$key"))
        .filter(_.nonEmpty)
        .map(Secrets.resolve(_, env))
    GraftConfig(
      dropDirectory = get("DROP_DIRECTORY", "drop"),
      archiveDirectory = get("ARCHIVE_DIRECTORY", "archive"),
      duplicatesDirectory = get("DUPLICATES_DIRECTORY", "duplicates"),
      warehouseDirectory = get("WAREHOUSE_DIRECTORY", "warehouse"),
      filePoolSize = get("FILE_POOL_SIZE", "2").toInt,
      smtpHost = opt("SMTP_HOST"),
      smtpPort = get("SMTP_PORT", "25").toInt,
      fromEmail = opt("FROM_EMAIL"),
      dataTeamEmail = opt("DATA_TEAM_EMAIL"),
      otelEndpoint = opt("OTEL_ENDPOINT"))
  }
}
