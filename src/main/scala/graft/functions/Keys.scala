package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key/path derivation, mirroring the reference's conventions.
  *
  * Reference: AzureSearchIndexer/IndexDefinitions/PathIndexModel.cs:13 —
  * `key = base64(utf8(join("%2f", filesystem, pathUrlEncoded)))`; paths
  * are stored url-encoded (HttpUtility.UrlEncode, lowercase escapes, so
  * '/' → "%2f").
  *
  * All helpers are pure Column expressions → whole-stage codegen, no UDFs.
  */
object Keys {

  /** Lowercase percent-encoding of the path chars the reference's data
    * actually contains (HttpUtility.UrlEncode leaves [A-Za-z0-9-_.] and
    * encodes the rest; our synthetic paths only need '/', ' ', ':').
    */
  def pathUrlEncode(path: Column): Column = {
    val enc = Seq("%" -> "%25", "/" -> "%2f", " " -> "+", ":" -> "%3a")
    enc.foldLeft(path) { case (c, (from, to)) => regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
  }

  /** The reference's document key: base64 of "filesystem%2f<encodedPath>".
    * Spark's base64 MIME-chunks outputs longer than 76 chars (CRLF
    * inserts) depending on the legacy conf; keys must be unchunked like
    * java.util.Base64 / DuckDB to_base64, so strip any line breaks.
    *
    * INVARIANT (relied upon by plan rewrites): the key embeds
    * `filesystem` and `pathUrlEncoded` verbatim, so any predicate on
    * those columns is key-stable and may be pushed below a per-key
    * shuffle (Search.searchIsMatchPath, PathIndexOps.listPathsDelta).
    * SearchSpec's "pushdown invariant" test pins this contract.
    */
  def pathKey(filesystem: Column, pathUrlEncoded: Column): Column =
    regexp_replace(
      base64(concat(filesystem, lit("%2f"), pathUrlEncoded).cast("binary")),
      "[\\r\\n]", "")

  /** Split an ADLS url ("https://host/filesystem/path…") into parts.
    * Reference: AzureSearchIndexer/Utils.cs:11-15 (UrlToFilesystemAndPath).
    */
  def urlFilesystem(url: Column): Column =
    regexp_extract(url, "^https://[^/]+/([^/]+)/(.*)$", 1)

  def urlPath(url: Column): Column =
    regexp_extract(url, "^https://[^/]+/([^/]+)/(.*)$", 2)
}
