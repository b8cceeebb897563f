package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX sheet reader on JDK-only primitives (SURVEY A26's
  * decode half, the reference's `pd.read_excel`,
  * `vendor_import.py:221`): an .xlsx is a ZIP of SpreadsheetML parts,
  * so `java.util.zip` + StAX cover the vendor code books without any
  * external Excel dependency. Understands the parts a code-book export
  * uses: workbook sheet registry (+ relationship targets), shared
  * strings, and worksheet cell values of types shared-string, inline
  * string, formula-cached string, boolean, and number.
  *
  * Cells come back as raw stored strings (all-TEXT contract, §1.2) —
  * no number formatting is applied. This runs driver-side: vendor code
  * books are small metadata sidecars (the reference loads them through
  * pandas on one machine too); bulk row data belongs in the lake, not
  * in spreadsheets.
  */
object Xlsx {

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // untrusted workbook: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  private def withReader[A](zip: ZipFile, entry: String)(f: XMLStreamReader => A): A = {
    val e = zip.getEntry(entry)
    if (e == null) throw new IllegalArgumentException(s"xlsx part not found: $entry")
    val in = zip.getInputStream(e)
    val r = newFactory().createXMLStreamReader(in)
    try f(r) finally { r.close(); in.close() }
  }

  /** Collect the concatenated text of all `<t>` descendants until the
    * matching end of the element the reader is positioned on (handles
    * both `<si><t>..</t></si>` and rich-text `<si><r><t>..</t></r>..`).
    * `<t>` membership is tracked by DEPTH, not a boolean — a nested
    * element inside `<t>` must not end text collection for the
    * remainder of the run — and phonetic `<rPh>` subtrees are skipped
    * entirely: their furigana `<t>` runs are annotations, not cell
    * content (pandas/openpyxl parity).
    */
  private def collectT(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    var tDepth = 0    // depth within a text-bearing <t> subtree
    var skipDepth = 0 // depth within a phonetic <rPh> subtree
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          if (skipDepth > 0 || r.getLocalName == "rPh") skipDepth += 1
          else if (tDepth > 0 || r.getLocalName == "t") tDepth += 1
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (skipDepth > 0) skipDepth -= 1
          else if (tDepth > 0) tDepth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (tDepth > 0 && skipDepth == 0) sb.append(r.getText)
        case _ => ()
      }
    }
    sb.toString
  }

  /** sheet name -> worksheet part path, via workbook.xml + its rels. */
  def sheetTargets(zip: ZipFile): Map[String, String] = {
    val rels = withReader(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship")
          m += r.getAttributeValue(null, "Id") -> r.getAttributeValue(null, "Target")
      }
      m.toMap
    }
    withReader(zip, "xl/workbook.xml") { r =>
      val m = mutable.LinkedHashMap.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // r:id lives in the officeDocument relationships namespace;
          // match by local name to stay version-agnostic
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach { target =>
            val normalized =
              if (target.startsWith("/")) target.stripPrefix("/")
              else s"xl/$target"
            m += name -> normalized
          }
        }
      }
      m.toMap
    }
  }

  /** The shared-string table (absent part == empty table). */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    withReader(zip, "xl/sharedStrings.xml") { r =>
      val out = IndexedSeq.newBuilder[String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "si")
          out += collectT(r)
      }
      out.result()
    }
  }

  /** "B7" -> 1 (0-based column index). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** One worksheet as (0-based col -> value) maps, one per row; empty
    * cells are simply absent.
    */
  def readRows(zip: ZipFile, part: String, shared: IndexedSeq[String]): Seq[Map[Int, String]] =
    withReader(zip, part) { r =>
      val rows = Seq.newBuilder[Map[Int, String]]
      var row: mutable.Map[Int, String] = null
      var cellCol = -1
      var cellType = ""
      var inV = false
      val v = new StringBuilder
      var inlineStr: String = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = mutable.Map.empty; cellCol = -1
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(cellCol + 1) // no ref attr: next col
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              v.clear(); inlineStr = null
            case "is" => inlineStr = collectT(r)
            case "v" => inV = true; v.clear()
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV) v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" => inV = false
            case "c" if row != null =>
              val value = cellType match {
                case "s" =>
                  // styled-but-cleared cells can carry an empty/absent
                  // <v>; treat any unparsable index as an empty cell
                  // rather than failing the whole workbook
                  v.toString.trim.toIntOption
                    .filter(i => i >= 0 && i < shared.length)
                    .map(shared).orNull
                case "inlineStr" => inlineStr
                case "b" => if (v.toString.trim == "1") "TRUE" else "FALSE"
                case _ => v.toString // "n", "str", "e": the stored text
              }
              if (value != null && value.nonEmpty) row += cellCol -> value
            case "row" => rows += row.toMap; row = null
            case _ => ()
          }
          case _ => ()
        }
      }
      rows.result()
    }

  /** Read one sheet as an all-string DataFrame, first row = header
    * (pd.read_excel's default). Headerless columns get `_c{i}` names;
    * data rows are padded with nulls to the header width.
    */
  def readSheet(spark: SparkSession, path: String, sheetName: String): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val targets = sheetTargets(zip)
      val part = targets.getOrElse(sheetName,
        throw new IllegalArgumentException(
          s"sheet '$sheetName' not in workbook (has: ${targets.keys.mkString(", ")})"))
      val rows = readRows(zip, part, sharedStrings(zip))
      if (rows.isEmpty)
        return spark.createDataFrame(
          java.util.Collections.emptyList[Row](), StructType(Nil))
      val width = rows.iterator.map(m => if (m.isEmpty) 0 else m.keysIterator.max + 1).max
      val header = (0 until width).map(i => rows.head.getOrElse(i, s"_c$i"))
      val data = rows.tail.map { m =>
        Row.fromSeq((0 until width).map(i => m.get(i).orNull))
      }
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava, schema)
    } finally zip.close()
  }
}

/** [[VendorImport.SheetProvider]] over a real .xlsx workbook — the
  * A26 decode seam filled with a dependency-free reader; swap-in
  * replacement for the CSV staging provider.
  */
final class XlsxSheetProvider(spark: SparkSession, path: String)
    extends VendorImport.SheetProvider {
  override def sheet(name: String): DataFrame = Xlsx.readSheet(spark, path, name)
}
