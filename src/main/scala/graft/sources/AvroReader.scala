package graft.sources

import graft.core._
import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container-file reader — the reference's own top TODO
  * (reference todo.txt:1-2 "avro reader").
  *
  * There is no spark-avro module on this classpath, so the read is built
  * from the public avro-core + avro-mapred artifacts instead: the driver
  * opens only the container HEADER for the writer schema, then a
  * `hadoopFile[AvroInputFormat]` RDD does the data read — Avro container
  * files are splittable on their sync markers, so a large file scans as
  * parallel partitions exactly like the built-in sources (no whole-file
  * driver read). Records convert to Rows inside the same task; nested
  * records flatten through the shared [[JsonFlatten]] pass so model
  * aliases resolve the way they do for JSON sources.
  *
  * Schema mapping covers the Avro primitives, nullable unions
  * (`[null, T]`), records, arrays, maps, enums/fixed, and the date /
  * timestamp-millis / timestamp-micros / decimal logical types.
  */
final class AvroReader extends Reader {
  val sourceType = "avro"

  def read(spark: SparkSession, path: String, source: SourceConfig): RawRead = {
    val fileName = FileUtils.bareName(path)
    val writerSchema = headerSchema(spark, path)
      .getOrElse(throw MissingHeaderError(fileName))
    if (writerSchema.getType != Schema.Type.RECORD ||
        writerSchema.getFields.isEmpty) throw MissingHeaderError(fileName)

    val structType = AvroConvert.sparkType(writerSchema).asInstanceOf[StructType]
    // Schema objects don't serialize; ship the canonical JSON and re-parse
    // once per partition.
    val schemaJson = writerSchema.toString

    val rows = spark.sparkContext.hadoopFile(
        path,
        classOf[AvroInputFormat[GenericRecord]],
        classOf[AvroWrapper[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { case (w, _) => AvroConvert.toRow(schema, w.datum()) }
      }
    val df = spark.createDataFrame(rows, structType)

    val flattened = JsonFlatten(df)
    if (flattened.isEmpty) throw NoDataInFileError(fileName)
    val checked = checkColumns(flattened, source, fileName)
    RawRead(checked, 1, () => Reader.withRowNumbers(checked, 1))
  }

  /** Driver-side header-only probe: DataFileStream reads the schema from the
    * container preamble without touching the data blocks.
    */
  private def headerSchema(spark: SparkSession, path: String): Option[Schema] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    try {
      val reader = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try Option(reader.getSchema) finally reader.close()
    } catch {
      case _: java.io.IOException => None // not an avro container
    } finally in.close() // close is idempotent; covers the ctor-throw path
  }
}

/** Avro schema/value -> Spark conversions, shared by reader and tests. */
object AvroConvert {

  /** Unwrap `[null, T]`-style unions to (T, nullable); multi-branch unions
    * map to their first non-null branch, and a datum carrying another branch
    * converts to NULL (see [[value]]) so it surfaces as a validation error
    * downstream — the engine's DLQ contract for malformed values.
    */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      (nonNull.head, nonNull.size != branches.size)
    }

  /** How many non-null branches a (possibly non-union) schema carries. */
  private def nonNullBranchCount(s: Schema): Int =
    if (s.getType != Schema.Type.UNION) 1
    else s.getTypes.asScala.count(_.getType != Schema.Type.NULL)

  def sparkType(schema: Schema): DataType = {
    val (s, _) = unwrap(schema)
    s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.INT => s.getLogicalType match {
        case _: LogicalTypes.Date => DateType
        case _ => IntegerType
      }
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          TimestampType
        case _ => LongType
      }
      case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, sparkType(f.schema()),
          nullable = unwrap(f.schema())._2 || f.schema().getType == Schema.Type.NULL)
      })
      case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
      case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
      case Schema.Type.NULL => NullType
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  def toRow(schema: Schema, record: GenericRecord): Row = {
    val (s, _) = unwrap(schema)
    Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
      value(f.schema(), record.get(f.pos()))))
  }

  private def value(schema: Schema, v: Any): Any = {
    if (v == null) return null
    val (s, _) = unwrap(schema)
    if (nonNullBranchCount(schema) > 1) {
      // multi-branch union: the column is typed as the FIRST non-null branch;
      // a datum carrying a different branch cannot be represented, so it
      // converts to NULL and the typed-validation stage DLQs the row (the
      // documented contract) instead of a ClassCastException killing the task.
      try convert(s, v) catch { case _: ClassCastException => null }
    } else convert(s, v)
  }

  private def convert(s: Schema, v: Any): Any =
    s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.INT => s.getLogicalType match {
        case _: LogicalTypes.Date =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[Number].intValue().toLong))
        case _ => v.asInstanceOf[Number].intValue()
      }
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          new java.sql.Timestamp(v.asInstanceOf[Number].longValue())
        case _: LogicalTypes.TimestampMicros =>
          val us = v.asInstanceOf[Number].longValue()
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        case _ => v.asInstanceOf[Number].longValue()
      }
      case Schema.Type.FLOAT => v.asInstanceOf[Number].floatValue()
      case Schema.Type.DOUBLE => v.asInstanceOf[Number].doubleValue()
      case Schema.Type.BOOLEAN => v.asInstanceOf[Boolean]
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = v match {
          case bb: ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case gf: GenericData.Fixed => gf.bytes()
          case arr: Array[Byte] => arr
        }
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case Schema.Type.RECORD => toRow(s, v.asInstanceOf[GenericRecord])
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(value(s.getElementType, _))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> value(s.getValueType, mv)
        }.toMap
      case Schema.Type.NULL => null
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
}
