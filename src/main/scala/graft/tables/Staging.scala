package graft.tables

/** One-time staged-layout cache keying.
  *
  * Staged layouts (partitioned tables, vector stores, signature stages) are
  * derived once per source dataset and reused across queries in a run. The
  * cache path must change whenever EITHER the derivation logic changes (the
  * caller versions its `tag`, e.g. "vector_store_v2") OR the source data
  * changes — so the path embeds a content fingerprint of the source
  * directory (file names + lengths + mtimes), not just the path string.
  * Regenerated testdata under the same path therefore always misses the old
  * cache instead of silently serving stale layouts, and two distinct dirs
  * can never collide the way `String.hashCode` could.
  */
object Staging {

  /** Hex fingerprint of a directory's listing: every file's name, length
    * and mtime, plus the absolute path itself. Cheap (one readdir, no file
    * reads) and changes whenever any source file is rewritten.
    */
  def dirFingerprint(dir: String): String = {
    val root = new java.io.File(dir)
    val files = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .sortBy(_.getName)
    val sig = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(dir + "||", "|", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 16)
  }

  /** Cache path for a staged layout derived from `dir`. `tag` names the
    * layout AND carries its version (bump per-layout, e.g. "_v2", when that
    * layout's derivation changes — independent layouts version
    * independently).
    */
  def stagedPath(tag: String, dir: String): String =
    sys.props("java.io.tmpdir") + s"/graft_${tag}_" + dirFingerprint(dir)
}
