package graft.plans

import graft.expressions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the native vector expressions as SQL
  * functions, so both the Column API (graft.functions.Vectors) and
  * spark.sql("… cosine_sim(a, b) …") hit the same codegen'd kernels.
  *
  * Install with:
  * {{{ .config("spark.sql.extensions", "graft.plans.GraftExtensions") }}}
  * (GraftSession.builder does this by default.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings in [0,1]"),
      (children: Seq[Expression]) => graft.expressions.JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_ids"),
      info("top_k_ids", "top_k_ids(ord, id, k) - ids of the k largest ord values, as an aggregate"),
      (children: Seq[Expression]) => {
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
        }
        graft.expressions.TopKIds(children(0), children(1), k).toAggregateExpression()
      }))
  }
}
