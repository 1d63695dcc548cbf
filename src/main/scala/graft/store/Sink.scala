package graft.store

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Where published target tables live.
  *
  * The reference dispatches writers by a global driver name — SQL Server /
  * Postgres / MySQL / SQLite / BigQuery (src/pipeline/write/factory.py:13-43);
  * the engine's run-metadata (log, DLQ, filename sidecars) stays in the
  * versioned parquet [[TableStore]] either way, and this seam swaps only the
  * TARGET table persistence. [[TableStore]] is the default (file-native)
  * implementation; [[JdbcSink]] loads relational targets.
  */
trait Sink {
  def exists(name: String): Boolean

  /** The current contents of the target, or None if never published. */
  def readIfExists(name: String): Option[DataFrame]

  /** Replace the target's contents with `df` — atomically or as close as the
    * backend allows. `partitionBy` is a storage layout hint; backends without
    * physical partitioning ignore it.
    */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit

  /** Reclaim superseded storage; no-op unless the backend versions. */
  def vacuum(name: String): Unit = ()
}

/** JDBC target sink (reference write/factory.py dialect dispatch; the
  * param-limit batching of write/mssql.py:29-41 maps to Spark's `batchsize`
  * JDBC option — each executor task inserts `batchSize`-row prepared-statement
  * batches in parallel).
  *
  * Overwrite protocol — two phases, for two reasons:
  *
  *   1. `df`'s plan usually READS the table being replaced (the publish merge
  *      joins new rows against the current target). A direct truncate + insert
  *      would have the insert job scan the just-truncated table (the classic
  *      JDBC self-overwrite trap), so the new contents are first landed in a
  *      `<name>__swap` stage table while the target is still intact.
  *   2. The swap itself (DELETE all + INSERT..SELECT from stage) runs in ONE
  *      driver-side transaction, so readers never observe a half-replaced
  *      table — the closest relational analogue of [[TableStore]]'s atomic
  *      version-pointer rename.
  *
  * At scale the parallel phase (executors batch-inserting the stage table) is
  * the data-volume work; the transactional swap is a single set-based
  * INSERT..SELECT the database executes internally.
  */
final class JdbcSink(
    spark: SparkSession,
    url: String,
    connectionProperties: Properties = new Properties(),
    batchSize: Int = 1000) extends Sink {

  private def withConnection[T](f: Connection => T): T = {
    val conn = DriverManager.getConnection(url, connectionProperties)
    try f(conn) finally conn.close()
  }

  /** Unquoted DDL identifiers are case-folded by the database (Derby/Postgres
    * uppercase/lowercase them); Spark's JDBC writer emits the table name
    * unquoted, so existence must check the folded forms too.
    */
  override def exists(name: String): Boolean = withConnection { conn =>
    val md = conn.getMetaData
    Seq(name, name.toUpperCase, name.toLowerCase).distinct.exists { n =>
      val rs = md.getTables(null, null, n, Array("TABLE"))
      try rs.next() finally rs.close()
    }
  }

  override def readIfExists(name: String): Option[DataFrame] =
    if (!exists(name)) None
    else Some(spark.read.jdbc(url, name, connectionProperties))

  override def overwrite(name: String, df: DataFrame,
                         partitionBy: Seq[String]): Unit = {
    val stage = s"${name}__swap"
    // Phase 1 (parallel, executors): land the new contents while the target
    // is still readable by df's own plan.
    df.write.mode(SaveMode.Overwrite)
      .option("batchsize", batchSize.toString)
      .jdbc(url, stage, connectionProperties)
    // Phase 2 (transactional, driver): swap contents set-based.
    val cols = df.schema.fieldNames.map(c => "\"" + c + "\"").mkString(", ")
    withConnection { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        if (!exists(name)) {
          // first publish: clone the stage's shape (Spark created it with
          // dialect-mapped types), then fill inside the same transaction
          st.executeUpdate(s"CREATE TABLE $name AS SELECT * FROM $stage WITH NO DATA")
        } else {
          st.executeUpdate(s"DELETE FROM $name")
        }
        st.executeUpdate(s"INSERT INTO $name ($cols) SELECT $cols FROM $stage")
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    }
    withConnection { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
    }
  }
}
