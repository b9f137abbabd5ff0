package graft.ingest

import java.io.ByteArrayInputStream
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
  * sheet1, header row, shared/inline strings, numbers, booleans;
  * missing cells become nulls. Numeric-looking columns are inferred
  * long → double (pandas-style); date serials and rich formatting are
  * out of scope.
  *
  * The parse is driver-side by design: a workbook is a small,
  * non-splittable operator artifact, not a data-plane format — the
  * pipeline lands it once and everything downstream is parquet. (A
  * 100 TB corpus never arrives as .xlsx.)
  */
object Xlsx {

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

  private def zipEntries(path: String): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new java.io.FileInputStream(path))
    try Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
      .map(e => e.getName -> zis.readAllBytes()).toMap
    finally zis.close()
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

  /** Sheet rows as (columnIndex → cell string), types already resolved
    * against the shared-string table.
    */
  private def sheetRows(doc: Document, shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
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
            case "s" => shared(r.toInt)
            case "b" => if (r.trim == "1") "true" else "false"
            case _   => r
          })
        }
      }.toMap
    }
  }

  private def inferType(values: Seq[String]): DataType = {
    def all(p: String => Boolean) = values.nonEmpty && values.forall(p)
    if (all(v => scala.util.Try(v.toLong).isSuccess)) LongType
    else if (all(v => scala.util.Try(v.toDouble).isSuccess)) DoubleType
    else if (all(v => v == "true" || v == "false")) BooleanType
    else StringType
  }

  /** Read an .xlsx workbook's first sheet into a DataFrame: row 1 is
    * the header, column types are inferred from the data rows.
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val entries = zipEntries(path)
    val shared = entries.get("xl/sharedStrings.xml")
      .map(b => sharedStrings(parseXml(b))).getOrElse(IndexedSeq.empty)
    val sheetName = entries.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
    val rows = sheetRows(parseXml(entries(sheetName)), shared)
    require(rows.nonEmpty, s"empty worksheet in $path")
    val header = rows.head
    val nCols = (rows.iterator.flatMap(_.keys) ++ Iterator(-1)).max + 1
    val names = (0 until nCols).map(i => header.getOrElse(i, s"col$i"))
    val data = rows.tail
    val types = (0 until nCols).map(i => inferType(data.flatMap(_.get(i))))
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val converted = data.map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        r.get(i).map { v =>
          types(i) match {
            case LongType    => v.toLong
            case DoubleType  => v.toDouble
            case BooleanType => v == "true"
            case _           => v
          }
        }.orNull
      })
    }
    spark.createDataFrame(converted.asJava, schema)
  }
}
