package graft.etl

/** Identifier sanitization — the public schema contract of the engine.
  *
  * Semantics match the reference's `_sanitize_name`
  * (`/root/reference/xml_handler.py:10-19`): dot -> underscore, keep only
  * "alphanumeric" characters and underscores, prefix `_` if the result
  * starts with a digit, and fall back to `unnamed_element` when empty.
  *
  * "Alphanumeric" is pinned to Python's Unicode-aware `str.isalnum()`:
  * letters plus the DECIMAL_DIGIT_NUMBER, LETTER_NUMBER and OTHER_NUMBER
  * categories (so `Ω`, `²`, `½` survive — verified against the reference
  * implementation). Java's `Character.isLetterOrDigit` alone would drop
  * No/Nl characters and silently change table names.
  */
object Sanitize {

  private def isPyAlnum(c: Char): Boolean =
    Character.isLetter(c) || (Character.getType(c) match {
      case Character.DECIMAL_DIGIT_NUMBER => true
      case Character.LETTER_NUMBER        => true
      case Character.OTHER_NUMBER         => true
      case _                              => false
    })

  /** Python `str.isdigit()` for the leading-char check: decimal digits
    * plus Numeric_Type=Digit characters (`²` is a digit, `½` is not —
    * fractions report a negative `getNumericValue`).
    */
  private def isPyDigit(c: Char): Boolean =
    Character.isDigit(c) || (Character.getType(c) == Character.OTHER_NUMBER &&
      Character.getNumericValue(c) >= 0)

  def sanitizeXmlName(name: String): String = {
    val kept = name.replace('.', '_').filter(c => isPyAlnum(c) || c == '_')
    val prefixed =
      if (kept.nonEmpty && isPyDigit(kept.head)) "_" + kept else kept
    if (prefixed.nonEmpty) prefixed else "unnamed_element"
  }

  /** Table names are lowercased at DDL time (`main_ingest.py:203`). */
  def tableName(tagSuggestion: String): String =
    sanitizeXmlName(tagSuggestion).toLowerCase

  /** `{table}_value` text-content column (`main_ingest.py:208`,
    * `xml_handler.py:91`) — the reference's load-bearing naming contract.
    */
  def valueColumnName(tableNameRaw: String): String =
    s"${tableNameRaw.toLowerCase}_value"

  /** Vendor sheet table naming (`vendor_import.py:223-225`):
    * `{source}_{sheet}` lowercased, spaces and dots to underscores.
    */
  def vendorTableName(source: String, sheet: String): String =
    s"${source}_$sheet".toLowerCase.replace(' ', '_').replace('.', '_')

  /** Strip a `{uri}local` XML namespace prefix (`xml_handler.py:59-62`). */
  def stripNamespace(rawTag: String): String =
    if (rawTag.startsWith("{")) {
      val i = rawTag.indexOf('}')
      if (i >= 0) rawTag.substring(i + 1) else rawTag
    } else rawTag
}
