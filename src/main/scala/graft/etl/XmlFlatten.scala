package graft.etl

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Streaming XML -> element-record flattener.
  *
  * Semantics match the reference's recursive DOM traversal
  * (`/root/reference/xml_handler.py:22-141`): one record per element in
  * document (pre)order, namespace-stripped tags, sanitized attribute keys,
  * nearest-ancestor PatientCareReport/@UUID propagated to every
  * descendant, `element.text` = character data between the start tag and
  * the first child (trimmed; None only when absent entirely), parse
  * failure -> empty result.
  *
  * Mechanics deliberately differ: StAX pull-parsing with an explicit
  * stack keeps memory bounded by tree depth, not file size — the
  * reference's whole-file DOM (`xml_handler.py:130`) is the anti-pattern
  * SURVEY.md §4 flags. This function is pure and runs inside an executor
  * `flatMap`, one task per file.
  */
object XmlFlatten {

  /** Element-id generation strategy (SURVEY A5). The reference uses
    * uuid4 per element; it only needs uniqueness + parent linkage, so the
    * deterministic variant (name-UUID of file#preorder) is the default —
    * it makes re-ingest reproducible and oracle-testable.
    */
  sealed trait IdGen extends Serializable {
    def id(sourceFile: String, preorder: Int): String
  }
  case object RandomUuid extends IdGen {
    override def id(f: String, p: Int): String =
      java.util.UUID.randomUUID.toString
  }
  case object DeterministicId extends IdGen {
    override def id(f: String, p: Int): String =
      java.util.UUID.nameUUIDFromBytes(s"$f#$p".getBytes("UTF-8")).toString
  }

  private final class Frame(
      val elementId: String,
      val tableName: String,
      val pcrUuid: Option[String]) {
    var seenChild = false
    var text: StringBuilder = null // null <=> no character data seen at all
  }

  /** One factory per executor thread: XMLInputFactory.newInstance does a
    * service-loader lookup, which dominates parse time for small
    * documents if done per call; factories are not thread-safe, readers
    * are cheap.
    */
  private val factory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      // No DTDs / external entities: ingest files are untrusted input.
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.setProperty(XMLInputFactory.IS_COALESCING, true)
      f
    }
  }

  private final class Builder(
      val elementId: String,
      val parentElementId: Option[String],
      val pcrUuid: Option[String],
      val elementTag: String,
      val fullTag: String,
      val tableName: String,
      val parentTableName: Option[String],
      val path: String,
      val attributes: Map[String, String],
      val preorder: Int) {
    var text: Option[String] = None
  }

  /** Parse one file's bytes into element records; empty on parse error
    * (the caller routes empty-parse files to the error flow, matching
    * `main_ingest.py:386-397`).
    */
  def parse(
      bytes: Array[Byte],
      sourceFile: String,
      fileMd5: String,
      idGen: IdGen = DeterministicId): Seq[ElementRecord] =
    try parseOrThrow(bytes, sourceFile, fileMd5, idGen)
    catch { case _: Exception => Seq.empty }

  def parseOrThrow(
      bytes: Array[Byte],
      sourceFile: String,
      fileMd5: String,
      idGen: IdGen): Seq[ElementRecord] = {
    val r: XMLStreamReader =
      factory.get().createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = ArrayBuffer.empty[Builder]
    var stack = List.empty[(Frame, Builder)]
    val pathParts = ArrayBuffer.empty[String]
    var preorder = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val uri = r.getNamespaceURI
            val local = r.getLocalName
            val fullTag = if (uri != null && uri.nonEmpty) s"{$uri}$local" else local
            val sanitized = Sanitize.sanitizeXmlName(local)
            var attrs = Map.newBuilder[String, String]
            var rawUuidAttr: Option[String] = None
            var i = 0
            while (i < r.getAttributeCount) {
              val aLocal = r.getAttributeLocalName(i)
              val v = r.getAttributeValue(i)
              if (aLocal == "UUID") rawUuidAttr = Some(v)
              attrs += (Sanitize.sanitizeXmlName(aLocal) -> v)
              i += 1
            }
            var attrMap = attrs.result()
            val parent = stack.headOption
            parent.foreach(_._1.seenChild = true)
            // nearest-ancestor PCR context; this element may establish it
            var pcr = parent.flatMap(_._1.pcrUuid)
            if (local == "PatientCareReport" && rawUuidAttr.isDefined) {
              pcr = rawUuidAttr
              val k = Sanitize.sanitizeXmlName("UUID")
              if (!attrMap.contains(k)) attrMap += (k -> rawUuidAttr.get)
            }
            pathParts += sanitized
            val b = new Builder(
              elementId = idGen.id(sourceFile, preorder),
              parentElementId = parent.map(_._1.elementId),
              pcrUuid = pcr,
              elementTag = local,
              fullTag = fullTag,
              tableName = sanitized,
              parentTableName = parent.map(_._1.tableName),
              path = pathParts.mkString("/"),
              attributes = attrMap,
              preorder = preorder)
            preorder += 1
            out += b
            stack = (new Frame(b.elementId, sanitized, pcr), b) :: stack

          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA |
              XMLStreamConstants.SPACE =>
            stack.headOption.foreach { case (f, _) =>
              if (!f.seenChild) {
                if (f.text == null) f.text = new StringBuilder
                f.text ++= r.getText
              }
            }

          case XMLStreamConstants.END_ELEMENT =>
            val (f, b) = stack.head
            b.text = if (f.text == null) None else Some(f.text.result().trim)
            stack = stack.tail
            pathParts.remove(pathParts.length - 1)

          case _ => ()
        }
      }
      out.iterator.map { b =>
        ElementRecord(
          element_id = b.elementId,
          parent_element_id = b.parentElementId,
          pcr_uuid_context = b.pcrUuid,
          element_tag = b.elementTag,
          full_xmlns_tag = b.fullTag,
          table_name = b.tableName,
          parent_table_name = b.parentTableName,
          element_path = b.path,
          attributes = b.attributes,
          text_value = b.text,
          source_file = sourceFile,
          file_md5 = fileMd5,
          preorder = b.preorder)
      }.toSeq
    } finally r.close()
  }
}
