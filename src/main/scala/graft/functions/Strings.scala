package graft.functions

import org.apache.spark.sql.Column

/** String-similarity kernels missing from org.apache.spark.sql.functions,
  * exposed as Columns over native codegen'd expressions (never UDFs —
  * these run |queries|·|vocab| or |candidates| times per pass).
  */
object Strings {

  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => ex}

  /** Jaro–Winkler similarity in [0,1] (graft.expressions.JaroWinkler;
    * DuckDB-compatible semantics, fuzz-verified — see the expression's
    * Scaladoc).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    toCol(graft.expressions.JaroWinkler(ex(a), ex(b)))
}
