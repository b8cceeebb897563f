package graft.etl

/** One row per XML element — the engine's parse-stage IR, mirroring the
  * reference's element dict (`/root/reference/xml_handler.py:93-104`) plus
  * file provenance and a preorder position (which the reference has only
  * implicitly as list order; keeping it explicit makes ids determinizable
  * and ordering reproducible in a distributed run).
  *
  * @param element_id        unique id (UUIDv4 or deterministic, see IdGen)
  * @param parent_element_id id of the parent element, null for the root
  * @param pcr_uuid_context  nearest-ancestor PatientCareReport/@UUID
  * @param element_tag       namespace-stripped tag
  * @param full_xmlns_tag    original tag including `{uri}` prefix
  * @param table_name        sanitized tag — the per-tag table routing key
  * @param parent_table_name sanitized tag of the parent element
  * @param element_path      sanitized tags joined root->element with '/'
  * @param attributes        attribute map, keys sanitized+namespace-stripped
  * @param text_value        element text trimmed; None when absent (empty
  *                          string when present but whitespace-only — the
  *                          reference distinguishes these, xml_handler.py:100)
  * @param source_file       ingest file path
  * @param file_md5          md5 of the file bytes (audit contract, A9)
  * @param preorder          0-based document-order position in the file
  */
case class ElementRecord(
    element_id: String,
    parent_element_id: Option[String],
    pcr_uuid_context: Option[String],
    element_tag: String,
    full_xmlns_tag: String,
    table_name: String,
    parent_table_name: Option[String],
    element_path: String,
    attributes: Map[String, String],
    text_value: Option[String],
    source_file: String,
    file_md5: String,
    preorder: Int)
