package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Flattener semantics against the reference's traversal
  * (`/root/reference/xml_handler.py:22-141`): preorder, parent linkage,
  * PCR propagation, namespace stripping, attribute-key sanitization,
  * ET-compatible text semantics, parse-error -> empty.
  */
class XmlFlattenSpec extends AnyFunSuite {

  private def parse(xml: String): Seq[ElementRecord] =
    XmlFlatten.parse(xml.getBytes("UTF-8"), "test.xml", "md5x")

  val nemsis =
    """<EMSDataSet xmlns="http://www.nemsis.org">
      |  <Header>
      |    <PatientCareReport UUID="pcr-1">
      |      <eVitals.01>2024-01-01T10:00:00</eVitals.01>
      |      <eVitals.VitalGroup>
      |        <eVitals.06 CodeType="9924001">120</eVitals.06>
      |      </eVitals.VitalGroup>
      |    </PatientCareReport>
      |    <PatientCareReport UUID="pcr-2">
      |      <eVitals.01>2024-01-02T11:00:00</eVitals.01>
      |    </PatientCareReport>
      |  </Header>
      |</EMSDataSet>""".stripMargin

  test("one record per element, in preorder") {
    val rs = parse(nemsis)
    assert(rs.map(_.element_tag) == Seq("EMSDataSet", "Header",
      "PatientCareReport", "eVitals.01", "eVitals.VitalGroup", "eVitals.06",
      "PatientCareReport", "eVitals.01"))
    assert(rs.map(_.preorder) == (0 until 8))
  }

  test("parent linkage resolves and root has no parent") {
    val rs = parse(nemsis)
    val byId = rs.map(r => r.element_id -> r).toMap
    assert(rs.head.parent_element_id.isEmpty)
    rs.tail.foreach { r =>
      assert(byId.contains(r.parent_element_id.get), s"dangling parent for ${r.element_tag}")
    }
    val vitals06 = rs.find(_.element_tag == "eVitals.06").get
    assert(byId(vitals06.parent_element_id.get).element_tag == "eVitals.VitalGroup")
  }

  test("PCR uuid context = nearest PatientCareReport ancestor (incl. self)") {
    val rs = parse(nemsis)
    assert(rs.take(2).forall(_.pcr_uuid_context.isEmpty)) // EMSDataSet, Header
    val pcr1Subtree = rs.slice(2, 6)
    assert(pcr1Subtree.forall(_.pcr_uuid_context.contains("pcr-1")))
    assert(rs.slice(6, 8).forall(_.pcr_uuid_context.contains("pcr-2")))
  }

  test("namespace stripped, full tag kept, names sanitized") {
    val rs = parse(nemsis)
    val v1 = rs.find(_.preorder == 3).get
    assert(v1.element_tag == "eVitals.01")
    assert(v1.full_xmlns_tag == "{http://www.nemsis.org}eVitals.01")
    assert(v1.table_name == "eVitals_01")
    assert(v1.element_path == "EMSDataSet/Header/PatientCareReport/eVitals_01")
  }

  test("attribute keys sanitized; PCR UUID injected as attribute") {
    val rs = parse(nemsis)
    val v6 = rs.find(_.element_tag == "eVitals.06").get
    assert(v6.attributes == Map("CodeType" -> "9924001"))
    val pcr = rs.find(_.pcr_uuid_context.contains("pcr-1")).get
    assert(pcr.attributes.get("UUID").contains("pcr-1"))
  }

  test("text semantics: absent -> None, whitespace-only -> empty string, trimmed otherwise") {
    val rs = parse("<a><b>  hi  </b><c>   </c><d/><e>x<f/>tail</e></a>")
    def tv(tag: String) = rs.find(_.element_tag == tag).get.text_value
    assert(tv("b").contains("hi"))
    assert(tv("c").contains("")) // present but whitespace: "" (xml_handler.py:100)
    assert(tv("d").isEmpty)      // absent: None
    assert(tv("e").contains("x")) // only text before first child
  }

  test("malformed XML -> empty result (parse_xml_file contract)") {
    assert(parse("<a><b></a>").isEmpty)
    assert(parse("not xml at all").isEmpty)
  }

  test("deterministic ids are stable across parses; uuid mode is not") {
    val a = parse(nemsis).map(_.element_id)
    val b = parse(nemsis).map(_.element_id)
    assert(a == b)
    val u1 = XmlFlatten.parse(nemsis.getBytes("UTF-8"), "f", "m", XmlFlatten.RandomUuid).map(_.element_id)
    val u2 = XmlFlatten.parse(nemsis.getBytes("UTF-8"), "f", "m", XmlFlatten.RandomUuid).map(_.element_id)
    assert(u1 != u2)
  }

  test("DTD / external entities are rejected, not resolved") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<foo>&xxe;</foo>""".stripMargin
    assert(parse(evil).isEmpty)
  }
}
