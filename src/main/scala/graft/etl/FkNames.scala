package graft.etl

import java.security.MessageDigest

/** Foreign-key constraint naming with PostgreSQL's 63-byte identifier
  * limit, behavior-compatible with the reference
  * (`/root/reference/main_ingest.py:512-584`): the ideal name
  * `fk_{child}_{parent}` is used as-is when it fits; otherwise both table
  * parts are truncated toward an equal split and a 6-hex md5-of-the-ideal
  * suffix keeps the name unique and deterministic.
  */
object FkNames {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  val MaxIdentifier = 63

  def fkConstraintName(childRaw: String, parentRaw: String): String = {
    val ideal = s"fk_${childRaw}_$parentRaw"
    if (ideal.length <= MaxIdentifier) ideal
    else {
      val hash = md5Hex(ideal).take(6)
      // budget for "child_parent" between "fk_" and "_<hash>"
      val maxNames = MaxIdentifier - 3 - hash.length - 1
      var child = childRaw
      var parent = parentRaw
      if (child.length + 1 + parent.length > maxNames) {
        val avail = maxNames - 1 // minus the separating underscore
        val maxChild = avail / 2
        var maxParent = avail - maxChild
        if (child.length > maxChild) {
          child = child.take(maxChild)
          maxParent = avail - child.length
        }
        if (parent.length > maxParent) parent = parent.take(maxParent)
        if (child.length + 1 + parent.length > maxNames)
          child = child.take(avail - parent.length - 1)
      }
      val out = s"fk_${child}_${parent}_$hash"
      if (out.length > MaxIdentifier) out.take(MaxIdentifier) else out
    }
  }
}
