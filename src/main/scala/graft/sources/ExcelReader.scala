package graft.sources

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.InputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Excel (.xlsx) reader (reference src/pipeline/read/excel.py:86-175).
  *
  * Spark has no built-in Excel source and this environment allows no extra
  * dependencies, so this is a minimal driver-side XLSX parser over the JDK's
  * zip + StAX: xlsx is a zip of XML parts — workbook.xml (sheet directory),
  * sharedStrings.xml (string table), worksheets/sheetN.xml (cell grid).
  * Excel files are human-scale (the reference buffers whole files in memory,
  * excel.py:90-103), so a driver-side parse followed by createDataFrame is
  * the right scale trade-off; the distributed pipeline starts immediately
  * after.
  *
  * All cells surface as strings; numeric cells keep their raw serial form so
  * that the validator's Excel-date rule can convert serial dates against the
  * 1899-12-30 epoch exactly like the reference (excel.py:21-23,62-84).
  *
  * Header handling mirrors excel.py:121-141: the first non-skipped row is the
  * header; all-blank headers raise MissingHeaderError.
  */
final class ExcelReader extends Reader {
  val sourceType = "excel"

  def read(spark: SparkSession, path: String, source: SourceConfig): RawRead = {
    val opts = source.formatOptions match {
      case e: ExcelOptions => e
      case _ => ExcelOptions()
    }
    val fileName = FileUtils.bareName(path)

    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows: Vector[Vector[String]] = {
      val in = fs.open(hPath)
      try Xlsx.readSheet(in, opts.sheetName)
      catch {
        case _: Xlsx.LegacyXlsFormat =>
          // OLE2 .xls is a different (binary) format this parser does not
          // read — report it honestly instead of "no data"
          throw UnsupportedFileTypeError(fileName,
            ".xls (legacy binary Excel; convert to .xlsx)")
        case _: Xlsx.SheetNotFound =>
          throw NoDataInFileError(fileName)
      } finally in.close()
    }

    // Row 1 is always the header (reference excel.py name_columns_by_row=0);
    // skip_rows then drops the first skip_rows DATA rows (excel.py:154-156
    // `if index <= self.skip_rows: continue`), same as the CSV reader.
    if (rows.isEmpty) throw NoDataInFileError(fileName)
    val header = rows.head
    // Blank headers, or all-default names (pyexcel numbers headerless
    // columns: every header blank or integer-like) — excel.py:121-141.
    val allDefault = header.nonEmpty && header.forall { h =>
      // dropWhile mirrors Python lstrip("-"): ALL leading dashes strip, so
      // "--12" counts as an integer-like default header (excel.py:133).
      val t = h.trim.dropWhile(_ == '-')
      h.trim.isEmpty || (t.nonEmpty && t.forall(_.isDigit))
    }
    if (header.isEmpty || header.forall(_.trim.isEmpty) || allDefault)
      throw MissingHeaderError(fileName)
    val data = rows.tail.drop(opts.skipRows)
    if (data.isEmpty) throw NoDataInFileError(fileName)

    val width = header.length
    val fields = header.zipWithIndex.map { case (h, i) =>
      StructField(if (h.trim.isEmpty) s"_c$i" else h.trim, StringType)
    }
    val schema = StructType(fields)
    val padded = data.map { r =>
      val cells = r.padTo(width, "").take(width)
        .map(c => if (c.isEmpty) null else c)
      Row.fromSeq(cells)
    }
    import scala.jdk.CollectionConverters._
    val df: DataFrame = spark.createDataFrame(padded.asJava, schema)
    val checked = checkColumns(df, source, fileName)
    // Data begins at 2 + skip_rows (reference excel.py:39-42). Excel data
    // is driver-local and tiny; numbering up-front is negligible.
    val numbered = Reader.withRowNumbers(checked, 2 + opts.skipRows)
    RawRead(numbered, 2 + opts.skipRows, () => numbered)
  }
}

/** Minimal XLSX part parser. Only what the engine needs: shared strings,
  * inline strings, numeric/boolean cells, sheet selection by name.
  */
object Xlsx {
  final class SheetNotFound(name: String)
      extends RuntimeException(s"sheet not found: $name")

  final class LegacyXlsFormat extends RuntimeException("OLE2 .xls format")

  private val xif = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Read the requested (or first) worksheet as a row-major string grid. */
  def readSheet(in: InputStream, sheetName: Option[String]): Vector[Vector[String]] = {
    // Buffer the zip once; entries are read in archive order, which need not
    // put sharedStrings before the sheet.
    val bytes = in.readAllBytes()
    // OLE2 compound-file magic = legacy binary .xls, not a zip
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
        (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0)
      throw new LegacyXlsFormat
    val parts = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) parts(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }

    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(Vector.empty)

    val sheetPath = sheetName match {
      case None => firstSheetPath(parts)
      case Some(n) =>
        sheetPathByName(parts, n).getOrElse(throw new SheetNotFound(n))
    }
    val sheetBytes = parts.getOrElse(sheetPath, throw new SheetNotFound(sheetPath))
    parseSheet(sheetBytes, shared)
  }

  private def firstSheetPath(parts: mutable.Map[String, Array[Byte]]): String =
    parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sortBy(p => p.replaceAll("\\D", "").toInt)
      .headOption.getOrElse(throw new SheetNotFound("<first>"))

  /** Resolve a sheet display name -> part path via workbook.xml + its rels. */
  private def sheetPathByName(parts: mutable.Map[String, Array[Byte]],
                              name: String): Option[String] = {
    val wb = parts.get("xl/workbook.xml").getOrElse(return None)
    val rels = parts.get("xl/_rels/workbook.xml.rels").getOrElse(return None)
    // sheet name -> r:id
    var rid: Option[String] = None
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(wb))
    while (r.hasNext && rid.isEmpty) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        if (attr(r, "name").contains(name))
          rid = attrNs(r, "id")
      }
    }
    r.close()
    rid.flatMap { id =>
      var target: Option[String] = None
      val rr = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(rels))
      while (rr.hasNext && target.isEmpty) {
        if (rr.next() == XMLStreamConstants.START_ELEMENT &&
            rr.getLocalName == "Relationship" && attr(rr, "Id").contains(id))
          target = attr(rr, "Target")
      }
      rr.close()
      target.map(t => if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
    }
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** Attribute in any namespace (r:id lives in the relationships ns). */
  private def attrNs(r: XMLStreamReader, name: String): Option[String] = attr(r, name)

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var inSi = false
    var inT = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Parse one worksheet to a dense row-major grid (gaps become ""). */
  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var cur: mutable.ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = -1
    var inV = false
    var inIs = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cur = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellType = attr(r, "t").getOrElse("n")
              cellCol = attr(r, "r").map(colIndex).getOrElse(cur.length)
            case "v" => inV = true; v.clear()
            case "is" => inIs = true
            case "t" if inIs => inV = true; v.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inV =>
              inV = false
              val raw = v.toString
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw
              }
              if (cur != null) {
                while (cur.length < cellCol) cur += ""
                if (cur.length == cellCol) cur += value else cur(cellCol) = value
              }
            case "is" => inIs = false
            case "row" => rows += cur.toVector; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** "BC12" -> zero-based column index 54. */
  private def colIndex(cellRef: String): Int = {
    var acc = 0
    var i = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}
