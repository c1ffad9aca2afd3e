package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler from Azure-Search-style OData filter strings to Catalyst
  * Columns.
  *
  * The reference drives every index read through OData filter strings —
  * e.g. `"filesystem eq 'stuff-large' and search.ismatch('partition_1*')"`
  * (reference: DatalakePathIndexerFunc/DatalakeIndexerFunc.cs:47,
  * AzureSearchIndexer/PathIndexClient.cs:57 `lastModified ge {t:o}`,
  * :88 `key gt '{previousKey}'`). This compiler gives the Spark engine
  * the same query surface: the output is a plain Column tree, so
  * Catalyst still pushes compiled predicates down to the parquet scan.
  *
  * Grammar (recursive descent):
  * {{{
  *   expr   := and_or | 'not' expr | '(' expr ')'
  *   and_or := cmp (('and'|'or') cmp)*        — 'and' binds tighter
  *   cmp    := field ('eq'|'ne'|'gt'|'ge'|'lt'|'le') literal
  *           | search.ismatch('pattern'[, 'field'])
  *           | search.in(field, 'v1,v2,…'[, 'delims'])
  *           | ('startswith'|'endswith'|'contains')(field, 'literal')
  *   literal:= 'single-quoted' | number | true | false | null
  * }}}
  * The three string functions and `search.in` are the filter functions
  * Azure Search's OData dialect supports on filterable string fields;
  * all compile to scan-level Column predicates (startswith reaches the
  * parquet scan as a StringStartsWith pushed filter).
  * `search.ismatch` supports trailing-`*` prefix patterns over
  * whitespace tokens, like the reference's `'partition_1*'` usage.
  */
object ODataFilter {

  /** Default searchable field for single-arg search.ismatch. */
  def compile(input: String, searchField: String = "text"): Column =
    new Parser(tokenize(input), searchField).parseAll()

  /** Token-prefix match: does any whitespace token of `field` match
    * `pattern` (literal token, or prefix when ending in `*`)?
    *
    * Implemented as plain string containment rather than
    * `exists(split(field,' '), …)`: identical semantics for
    * space-delimited tokens (the DuckDB oracle keeps the token-based
    * formulation, proving the rewrite), but no per-row array
    * materialization — it stays a scan-level predicate.
    */
  def isMatch(field: Column, pattern: String): Column =
    if (pattern.endsWith("*")) {
      val prefix = pattern.dropRight(1)
      field.startsWith(prefix) || field.contains(" " + prefix)
    } else {
      concat(lit(" "), field, lit(" ")).contains(s" $pattern ")
    }

  // ---- lexer ----
  private def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += "("; i += 1
        case ')' => out += ")"; i += 1
        case ',' => out += ","; i += 1
        case '\'' =>
          val sb = new StringBuilder("'")
          i += 1
          while (i < s.length && s(i) != '\'') { sb += s(i); i += 1 }
          require(i < s.length, s"unterminated string literal in: $s")
          i += 1 // closing quote
          out += sb.toString
        case _ =>
          val start = i
          while (i < s.length && !s(i).isWhitespace && !"(),'".contains(s(i))) i += 1
          out += s.substring(start, i)
      }
    }
    out.toList
  }

  private final class Parser(var toks: List[String], searchField: String) {
    private def peek: Option[String] = toks.headOption
    private def next(): String = { val h = toks.head; toks = toks.tail; h }
    private def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t' but got '$got'")
    }

    def parseAll(): Column = {
      val c = parseOr()
      require(toks.isEmpty, s"trailing tokens: ${toks.mkString(" ")}")
      c
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (peek.contains("or")) { next(); left = left || parseAnd() }
      left
    }

    private def parseAnd(): Column = {
      var left = parseUnary()
      while (peek.contains("and")) { next(); left = left && parseUnary() }
      left
    }

    private def parseUnary(): Column = peek match {
      case Some("not") => next(); !parseUnary()
      case Some("(") => next(); val c = parseOr(); expect(")"); c
      case Some("search.ismatch") => parseIsMatch()
      case Some("search.in") => parseSearchIn()
      case Some(fn @ ("startswith" | "endswith" | "contains")) => next(); parseStringFn(fn)
      case _ => parseCmp()
    }

    /** search.in(field, 'a,b,c'[, 'delims']) — set membership over a
      * delimited value list (default delimiters: comma and space, like
      * the service's).
      */
    private def parseSearchIn(): Column = {
      expect("search.in"); expect("(")
      val field = col(next())
      expect(",")
      val values = literalString(next())
      val delims = if (peek.contains(",")) { next(); literalString(next()) } else ", "
      expect(")")
      val split = values.split(delims.map(c => java.util.regex.Pattern.quote(c.toString)).mkString("[", "", "]"))
        .map(_.trim).filter(_.nonEmpty)
      require(split.nonEmpty, s"search.in with empty value list: '$values'")
      field.isin(split.toIndexedSeq: _*)
    }

    private def parseStringFn(fn: String): Column = {
      expect("(")
      val field = col(next())
      expect(",")
      val arg = literalString(next())
      expect(")")
      fn match {
        case "startswith" => field.startsWith(arg)
        case "endswith" => field.endsWith(arg)
        case "contains" => field.contains(arg)
      }
    }

    private def parseIsMatch(): Column = {
      expect("search.ismatch"); expect("(")
      val pat = literalString(next())
      val field = if (peek.contains(",")) { next(); literalString(next()) } else searchField
      expect(")")
      isMatch(col(field), pat)
    }

    private def literalString(tok: String): String = {
      require(tok.startsWith("'"), s"expected string literal, got '$tok'")
      tok.drop(1)
    }

    private def parseCmp(): Column = {
      val field = col(next())
      val op = next()
      val tok = next()
      // OData null comparisons are IS [NOT] NULL, not three-valued
      // equality: `field eq null` via `=== lit(null)` would evaluate to
      // NULL and filter out EVERY row. Ordering against null is an error.
      if (tok == "null") return op match {
        case "eq" => field.isNull
        case "ne" => field.isNotNull
        case other => throw new IllegalArgumentException(
          s"operator '$other' is not supported with null (only eq/ne)")
      }
      val lit0 = parseLiteral(tok)
      op match {
        case "eq" => field === lit0
        case "ne" => field =!= lit0
        case "gt" => field > lit0
        case "ge" => field >= lit0
        case "lt" => field < lit0
        case "le" => field <= lit0
        case other => throw new IllegalArgumentException(s"unknown operator '$other'")
      }
    }

    private def parseLiteral(tok: String): Column = tok match {
      case t if t.startsWith("'") => lit(t.drop(1))
      case "true" => lit(true)
      case "false" => lit(false)
      case t if t.matches("-?\\d+") => lit(t.toLong)
      case t if t.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?") => lit(t.toDouble)
      case t if t.matches("\\d{4}-\\d{2}-\\d{2}T[\\d:.]+(Z|[+-]\\d{2}:\\d{2})?") =>
        // OData emits unquoted ISO-8601 datetimes ("lastModified ge
        // 2023-09-28T05:00:00Z" — reference: PathIndexClient.cs:57 uses
        // the round-trip 'o' format); compare as a timestamp
        lit(java.sql.Timestamp.from(
          java.time.OffsetDateTime.parse(
            if (t.matches(".*(Z|[+-]\\d{2}:\\d{2})$")) t else t + "Z").toInstant))
      case t => throw new IllegalArgumentException(s"bad literal '$t'")
    }
  }
}
