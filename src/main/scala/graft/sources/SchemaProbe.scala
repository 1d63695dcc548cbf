package graft.sources

import graft.core.ColumnSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Encoding-adaptive access to driver-regenerated testdata columns.
  *
  * The testdata generator has re-encoded time columns across rounds —
  * `events.ts` has shipped as nanosecond INT64, microsecond TIMESTAMP, and
  * TIMESTAMP_NTZ — and every query that hard-codes one encoding crashes
  * (or silently mis-computes) the round the parquet changes. This is THE
  * shared probe seam: all readers of `/root/testdata` time columns route
  * through it, so a new encoding is one fix here, not a hunt across
  * queries. PropertiesSpec pins each branch.
  *
  * Everything fails LOUDLY on an encoding it does not understand: a wrong
  * silent epoch is the failure mode this module exists to prevent.
  */
object SchemaProbe {

  /** Epoch-MICROsecond view of a time column, exact under every encoding
    * the driver has shipped: nano-INT64 -> floor-div by 1000 (floor, not
    * `div`: toward-zero truncation disagrees with DuckDB's floor-based
    * truncation for pre-1970 negative epochs); TIMESTAMP -> `unix_micros`;
    * TIMESTAMP_NTZ -> cast through the UTC session (the naive value reads
    * as UTC — identical to DuckDB's `epoch_us` on the same file). Integer
    * arithmetic throughout: epoch longs exceed 2^53, double division is
    * unsafe.
    */
  def epochMicros(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType =>
        // floor-div by 1000 as one codegen'd integer expression
        expr(s"($field - ((($field % 1000) + 1000) % 1000)) div 1000")
      case TimestampType    => unix_micros(col(field))
      case TimestampNTZType => unix_micros(col(field).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"$field: unsupported time encoding $other (expected nano-long or timestamp)")
    }

  /** A TimestampType view of a time column for range filters and calendar
    * functions. When the column is already TIMESTAMP this is the BARE
    * column — range predicates stay pushable parquet row-group filters;
    * only a drifted encoding pays the conversion (NTZ/date cast, or
    * nano-long through [[epochMicros]]).
    */
  def asTimestamp(df: DataFrame, field: String): Column =
    df.schema(field).dataType match {
      case TimestampType                 => col(field)
      case TimestampNTZType | DateType   => col(field).cast(TimestampType)
      case LongType => timestamp_micros(epochMicros(df, field))
      case other => throw new IllegalArgumentException(
        s"$field: unsupported time encoding $other (expected timestamp, date, or nano-long)")
    }

  /** The [[ColumnSpec]] matching a time column's ON-DISK encoding, for
    * validation sources built over the testdata (the q4 pattern): nano-long
    * files validate the long, timestamp files the timestamp — the spec
    * adapts instead of crashing the typed projection when the driver
    * re-encodes.
    */
  def timestampSpec(df: DataFrame, field: String,
                    nullable: Boolean = true): ColumnSpec =
    df.schema(field).dataType match {
      case LongType          => ColumnSpec.long(field, nullable = nullable)
      case DateType          => ColumnSpec.date(field, nullable = nullable)
      case TimestampType | TimestampNTZType =>
        ColumnSpec.timestamp(field, nullable = nullable)
      case other => throw new IllegalArgumentException(
        s"$field: unsupported time encoding $other for a validation spec")
    }
}
