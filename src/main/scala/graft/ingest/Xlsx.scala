package graft.ingest

import java.io.ByteArrayInputStream
import java.time.LocalDate
import java.time.temporal.ChronoUnit
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free minimal XLSX reader — closes the one reference
  * capability (O1, `pd.read_excel`, PostgresDatabase.py:130) that had
  * no runnable twin: the environment has no POI/spark-excel jar, but
  * an .xlsx is a ZIP of XML and the JDK ships both. Scope mirrors the
  * reference's actual use (operator-uploaded tabular workbooks):
  * sheet1, header row, shared/inline strings, numbers, booleans,
  * date serials; missing cells become nulls. Numeric-looking columns
  * are inferred long → double (pandas-style); numeric cells whose
  * style carries a date number-format are decoded to timestamps the
  * way pandas' `datetime64[ns]` does (the reference's own dataset has
  * a `дата` date column, ETLManager.py:42-48), honoring the workbook's
  * 1904-epoch flag.
  *
  * The parse is driver-side by design: a workbook is a small,
  * non-splittable operator artifact, not a data-plane format — the
  * pipeline lands it once and everything downstream is parquet. (A
  * 100 TB corpus never arrives as .xlsx.)
  */
object Xlsx {

  /** Decompression caps: a workbook is an operator artifact, not bulk
    * data — anything past these limits is malformed or a zip bomb, and
    * failing fast beats OOMing the driver.
    */
  private val MaxEntryBytes: Long = 256L * 1024 * 1024
  private val MaxTotalBytes: Long = 512L * 1024 * 1024

  /** "AB7" → 27 (0-based column index from the letter prefix). */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) =>
      acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // no DTDs/external entities: workbook XML never needs them
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** Entries the reader actually consumes — everything else (media,
    * themes, calc chains) is skipped without decompression.
    */
  private def wanted(name: String): Boolean =
    name == "xl/workbook.xml" || name == "xl/styles.xml" ||
      name == "xl/sharedStrings.xml" ||
      name.matches("xl/worksheets/sheet\\d+\\.xml")

  private def readCapped(zis: ZipInputStream, name: String, totalSoFar: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = zis.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > MaxEntryBytes || totalSoFar + out.size() > MaxTotalBytes)
        throw new IllegalArgumentException(
          s"xlsx entry $name exceeds decompression cap ($MaxEntryBytes/entry, $MaxTotalBytes total) — refusing to read")
      n = zis.read(buf)
    }
    out.toByteArray
  }

  private def zipEntries(path: String): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new java.io.FileInputStream(path))
    try {
      var total = 0L
      val acc = Map.newBuilder[String, Array[Byte]]
      Iterator.continually(zis.getNextEntry).takeWhile(_ != null).foreach { e =>
        if (wanted(e.getName)) {
          val bytes = readCapped(zis, e.getName, total)
          total += bytes.length
          acc += e.getName -> bytes
        }
      }
      acc.result()
    } finally zis.close()
  }

  /** Shared-string table: one string per <si> (rich-text runs are
    * concatenated across their <t> children).
    */
  private def sharedStrings(doc: Document): IndexedSeq[String] = {
    val sis = doc.getElementsByTagName("si")
    (0 until sis.getLength).map { i =>
      val ts = sis.item(i).asInstanceOf[Element].getElementsByTagName("t")
      (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
    }
  }

  /** numFmtIds Excel reserves for date/time formats (ECMA-376 §18.8.30). */
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date format iff it contains a date/time
    * token after bracketed sections ([Red], [$-409]), quoted literals,
    * and backslash escapes are stripped — the same heuristic pandas'
    * xlrd/openpyxl stack applies.
    */
  private[graft] def isDateFormatCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\\\.", "")
    stripped.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** cellXfs style index → is-date-format, resolved through numFmts. */
  private def dateStyles(doc: Document): IndexedSeq[Boolean] = {
    val custom = {
      val fmts = doc.getElementsByTagName("numFmt")
      (0 until fmts.getLength).map { i =>
        val e = fmts.item(i).asInstanceOf[Element]
        e.getAttribute("numFmtId").toInt -> isDateFormatCode(e.getAttribute("formatCode"))
      }.toMap
    }
    val xfsParents = doc.getElementsByTagName("cellXfs")
    if (xfsParents.getLength == 0) IndexedSeq.empty
    else {
      val xfs = xfsParents.item(0).asInstanceOf[Element].getElementsByTagName("xf")
      (0 until xfs.getLength).map { i =>
        val idAttr = xfs.item(i).asInstanceOf[Element].getAttribute("numFmtId")
        val id = if (idAttr.isEmpty) 0 else idAttr.toInt
        builtinDateFmts.contains(id) || custom.getOrElse(id, false)
      }
    }
  }

  /** The 1904-epoch workbook flag (<workbookPr date1904="1"/>). */
  private def is1904(doc: Document): Boolean = {
    val prs = doc.getElementsByTagName("workbookPr")
    (0 until prs.getLength).exists { i =>
      val v = prs.item(i).asInstanceOf[Element].getAttribute("date1904")
      v == "1" || v == "true"
    }
  }

  /** Excel serial → naive timestamp, pandas-compatible: day 0 is
    * 1899-12-30 (absorbing Excel's 1900 leap-year bug the way pandas
    * does) or 1904-01-01 under the 1904 system; the fraction is the
    * time of day.
    */
  private[graft] def serialToDateTime(serial: Double, epoch1904: Boolean): java.time.LocalDateTime = {
    val epoch = if (epoch1904) LocalDate.of(1904, 1, 1) else LocalDate.of(1899, 12, 30)
    // serial ≤ ~1e5 for any real date, so serial*86.4e9 µs stays far
    // below 2^53 — the double round-trip is exact to the microsecond
    val micros = Math.round(serial * 86400000000L.toDouble)
    epoch.atStartOfDay.plus(micros, ChronoUnit.MICROS)
  }

  /** A parsed cell: resolved text plus whether it is a date-styled
    * numeric (a date serial awaiting decode).
    */
  private case class Cell(v: String, date: Boolean)

  /** Sheet rows as (columnIndex → cell), types already resolved
    * against the shared-string table and date styles.
    */
  private def sheetRows(doc: Document, shared: IndexedSeq[String],
                        dateStyle: IndexedSeq[Boolean]): Seq[Map[Int, Cell]] = {
    val rows = doc.getElementsByTagName("row")
    (0 until rows.getLength).map { i =>
      val cells = rows.item(i).asInstanceOf[Element].getElementsByTagName("c")
      (0 until cells.getLength).flatMap { j =>
        val c = cells.item(j).asInstanceOf[Element]
        // the r attribute is optional in OOXML; writers that omit it
        // imply sequential placement
        val ref = c.getAttribute("r")
        val idx = if (ref.exists(_.isLetter)) colIndex(ref) else j
        val t = c.getAttribute("t")
        val sAttr = c.getAttribute("s")
        val styled = sAttr.nonEmpty && {
          val s = sAttr.toInt
          s >= 0 && s < dateStyle.length && dateStyle(s)
        }
        val raw =
          if (t == "inlineStr") {
            val ts = c.getElementsByTagName("t")
            if (ts.getLength == 0) None
            else Some((0 until ts.getLength).map(ts.item(_).getTextContent).mkString)
          } else {
            val v = c.getElementsByTagName("v")
            if (v.getLength == 0) None else Some(v.item(0).getTextContent)
          }
        raw.map { r =>
          idx -> (t match {
            case "s" => Cell(shared(r.toInt), date = false)
            case "b" => Cell(if (r.trim == "1") "true" else "false", date = false)
            // numeric (t empty or "n") — a date style makes it a serial
            case _   => Cell(r, date = styled)
          })
        }
      }.toMap
    }
  }

  private def inferType(values: Seq[Cell]): DataType = {
    def all(p: Cell => Boolean) = values.nonEmpty && values.forall(p)
    if (all(_.date)) TimestampNTZType
    else if (all(c => scala.util.Try(c.v.toLong).isSuccess)) LongType
    else if (all(c => scala.util.Try(c.v.toDouble).isSuccess)) DoubleType
    else if (all(c => c.v == "true" || c.v == "false")) BooleanType
    else StringType
  }

  /** Pandas-style header dedup: repeated names become name.1, name.2 …
    * so downstream by-name selects stay unambiguous.
    */
  private[graft] def dedupHeaders(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"$n.$k"
    }
  }

  /** Read an .xlsx workbook's first sheet into a DataFrame: row 1 is
    * the header, column types are inferred from the data rows.
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val entries = zipEntries(path)
    val shared = entries.get("xl/sharedStrings.xml")
      .map(b => sharedStrings(parseXml(b))).getOrElse(IndexedSeq.empty)
    val dateStyle = entries.get("xl/styles.xml")
      .map(b => dateStyles(parseXml(b))).getOrElse(IndexedSeq.empty)
    val epoch1904 = entries.get("xl/workbook.xml")
      .exists(b => is1904(parseXml(b)))
    val sheetName = entries.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
    val rows = sheetRows(parseXml(entries(sheetName)), shared, dateStyle)
    require(rows.nonEmpty, s"empty worksheet in $path")
    val header = rows.head
    val nCols = (rows.iterator.flatMap(_.keys) ++ Iterator(-1)).max + 1
    val names = dedupHeaders((0 until nCols).map(i =>
      header.get(i).map(_.v).getOrElse(s"col$i")))
    val data = rows.tail
    val types = (0 until nCols).map(i => inferType(data.flatMap(_.get(i))))
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val converted = data.map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        r.get(i).map { c =>
          types(i) match {
            case TimestampNTZType => serialToDateTime(c.v.toDouble, epoch1904)
            case LongType         => c.v.toLong
            case DoubleType       => c.v.toDouble
            case BooleanType      => c.v == "true"
            case _                => c.v
          }
        }.orNull
      })
    }
    spark.createDataFrame(converted.asJava, schema)
  }
}
