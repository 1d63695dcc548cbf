package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Credential configuration for object-store filesystems.
  *
  * The reference ships a dedicated lister per cloud with its own auth
  * plumbing (reference src/file_helper/aws_file_helper.py:58-90,
  * azure_file_helper.py, gcp_file_helper.py: boto3 / azure-identity /
  * google-auth clients built from settings). This engine's file path is
  * URI-uniform — one Hadoop `FileSystem` code path for file:// s3a://
  * abfss:// gs:// ([[graft.run.FileOps]]) and the same for every
  * `spark.read` — so the per-cloud surface reduces to *Hadoop configuration
  * keys*. This object maps the engine's `GRAFT_[<ENV_STATE>_]*` settings
  * (same resolution order as [[GraftConfig]]) onto those keys.
  *
  * Env surface (each also honors the `GRAFT_<ENV_STATE>_` prefix):
  *  - `GRAFT_AWS_ACCESS_KEY_ID` / `GRAFT_AWS_SECRET_ACCESS_KEY` /
  *    `GRAFT_AWS_SESSION_TOKEN` → `fs.s3a.{access.key,secret.key,
  *    session.token}` (a session token switches the credentials provider to
  *    the temporary-credentials one)
  *  - `GRAFT_AWS_ENDPOINT_URL` → `fs.s3a.endpoint` + path-style access
  *    (MinIO/LocalStack-style endpoints address buckets by path)
  *  - `GRAFT_AWS_REGION` → `fs.s3a.endpoint.region`
  *  - `GRAFT_AZURE_STORAGE_ACCOUNT` + `GRAFT_AZURE_STORAGE_KEY` →
  *    `fs.azure.account.key.<account>.{dfs,blob}.core.windows.net`
  *  - `GRAFT_GCP_SERVICE_ACCOUNT_KEYFILE` →
  *    `google.cloud.auth.service.account.{enable,json.keyfile}`
  *  - `GRAFT_HADOOP_CONF` — escape hatch: `key=value;key=value` pairs set
  *    verbatim for anything not covered above
  *
  * The connector JARs themselves (hadoop-aws, hadoop-azure, gcs-connector)
  * are deploy-time classpath additions, exactly as on any Spark cluster;
  * [[missingConnectorHint]] turns the otherwise-cryptic "No FileSystem for
  * scheme" failure into an actionable message.
  */
object CloudCredentials {

  /** Resolved Hadoop settings implied by the environment. Pure — the tested
    * surface; [[install]] applies them.
    */
  def hadoopSettings(env: Map[String, String] = sys.env): Map[String, String] = {
    val state = env.getOrElse("GRAFT_ENV_STATE", "dev").toUpperCase
    def opt(key: String): Option[String] =
      env.get(s"GRAFT_${state}_$key").orElse(env.get(s"GRAFT_$key"))
        .filter(_.nonEmpty)

    val b = Map.newBuilder[String, String]
    opt("AWS_ACCESS_KEY_ID").foreach(v => b += "fs.s3a.access.key" -> v)
    opt("AWS_SECRET_ACCESS_KEY").foreach(v => b += "fs.s3a.secret.key" -> v)
    opt("AWS_SESSION_TOKEN").foreach { t =>
      b += "fs.s3a.session.token" -> t
      b += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
    }
    opt("AWS_ENDPOINT_URL").foreach { e =>
      b += "fs.s3a.endpoint" -> e
      b += "fs.s3a.path.style.access" -> "true"
    }
    opt("AWS_REGION").foreach(v => b += "fs.s3a.endpoint.region" -> v)

    for (acct <- opt("AZURE_STORAGE_ACCOUNT"); key <- opt("AZURE_STORAGE_KEY")) {
      b += s"fs.azure.account.key.$acct.dfs.core.windows.net" -> key
      b += s"fs.azure.account.key.$acct.blob.core.windows.net" -> key
    }

    opt("GCP_SERVICE_ACCOUNT_KEYFILE").foreach { kf =>
      b += "google.cloud.auth.service.account.enable" -> "true"
      b += "google.cloud.auth.service.account.json.keyfile" -> kf
    }

    opt("HADOOP_CONF").foreach { pairs =>
      pairs.split(';').iterator.map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"GRAFT_HADOOP_CONF entries must be key=value, got '$kv'")
        b += kv.take(i).trim -> kv.drop(i + 1).trim
      }
    }
    b.result()
  }

  /** Apply the environment's settings to a Hadoop configuration (the
    * session's `sparkContext.hadoopConfiguration` — shared by `spark.read`,
    * streaming checkpoints, and [[graft.run.FileOps]]).
    */
  def install(conf: Configuration, env: Map[String, String] = sys.env): Unit =
    hadoopSettings(env).foreach { case (k, v) => conf.set(k, v) }

  def install(spark: SparkSession): Unit =
    install(spark.sparkContext.hadoopConfiguration)

  /** Deploy guidance for a missing-filesystem-connector failure, or None if
    * the throwable is something else. Two shapes occur: schemes Hadoop has
    * no mapping for fail "No FileSystem for scheme: x"; schemes whose impl
    * class IS pre-mapped in core-default.xml (s3a, abfs, wasb) but whose jar
    * is absent fail with a ClassNotFoundException-wrapping RuntimeException
    * ("Class org.apache.hadoop.fs.s3a.S3AFileSystem not found").
    */
  def missingConnectorHint(e: Throwable): Option[String] = {
    val m = Option(e.getMessage).getOrElse("")
    val bySchemeRe = "No FileSystem for scheme:?\\s*\"?([A-Za-z0-9+.-]+)".r
    val byClassRe = "Class ([A-Za-z0-9_.$]+) not found".r
    val scheme = bySchemeRe.findFirstMatchIn(m).map(_.group(1))
      .orElse(byClassRe.findFirstMatchIn(m).map(_.group(1)).collect {
        case c if c.contains(".s3a.") || c.contains(".s3.") => "s3a"
        case c if c.contains(".azurebfs.") => "abfss"
        case c if c.contains(".azure.") => "wasbs"
        case c if c.contains("gcsfs") || c.contains(".gcs.") => "gs"
      })
    scheme.map { s =>
      val jar = s match {
        case "s3a" | "s3" => "hadoop-aws (+ aws-java-sdk-bundle)"
        case "abfss" | "abfs" | "wasbs" | "wasb" => "hadoop-azure"
        case "gs" => "gcs-connector"
        case other => s"the Hadoop filesystem connector for '$other'"
      }
      s"scheme '$s' has no usable FileSystem on this classpath: add $jar " +
        s"to the cluster classpath (credentials themselves are configured " +
        s"via GRAFT_* env, see CloudCredentials)"
    }
  }
}
