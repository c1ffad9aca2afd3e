package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Search-analyzer semantics for match queries.
  *
  * The reference's path indexes attach a custom analyzer
  * ("foo-analyser" = keyword_v2 tokenizer + lowercase filter —
  * reference: SearchIndexerTest/Program.cs:61-62,
  * PathIndexModel.cs:16): the whole field is ONE lowercased token, so
  * `search.ismatch('partition*')` means a lowercase wildcard match
  * against the entire path string. Text fields use a standard-style
  * analyzer: split on non-alphanumerics, lowercase.
  */
object Analyzers {

  /** keyword_v2 + lowercase: the whole value as a single token. */
  def keywordLower(field: Column): Column = lower(field)

  /** standard-ish analysis: lowercase, split on non-alphanumerics,
    * drop empty tokens.
    */
  def standardTokens(field: Column): Column =
    filter(split(lower(field), "[^a-z0-9]+"), t => t =!= "")

  /** Multi-term `search.ismatch` under the standard analyzer: the query
    * is analyzed with the same pipeline as the field (lowercase, split
    * on non-alphanumerics), and the document matches when ALL query
    * terms occur in its token set (`matchAll = true`, Azure Search's
    * `searchMode=all`) or ANY term does (`matchAll = false`, the
    * default `searchMode=any`). Pure Column expressions — the per-term
    * membership tests stay inside whole-stage codegen.
    */
  def isMatchTerms(field: Column, query: String, matchAll: Boolean = true): Column = {
    val terms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(terms.nonEmpty, s"ismatch query analyzed to zero terms: '$query'")
    val toks = standardTokens(field)
    val hits = terms.map(t => array_contains(toks, t))
    if (matchAll) hits.reduce(_ && _) else hits.reduce(_ || _)
  }

  /** Wildcard ismatch under the keyword analyzer: '*' in the pattern
    * matches any run of characters; comparison is lowercase. A pure
    * prefix pattern compiles to startswith (scan-friendly); general
    * patterns compile to an anchored regex.
    */
  def isMatchKeyword(field: Column, pattern: String): Column = {
    val lowered = pattern.toLowerCase
    if (lowered.endsWith("*") && !lowered.dropRight(1).contains("*"))
      keywordLower(field).startsWith(lowered.dropRight(1))
    else {
      val regex = "^" + lowered.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*") + "$"
      keywordLower(field).rlike(regex)
    }
  }
}
