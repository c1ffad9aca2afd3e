package graft

import graft.functions.Analyzers
import org.apache.spark.sql.functions._

class AnalyzersSpec extends SparkSpec {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect().head.get(0)

  test("keyword analyzer: whole value, lowercased") {
    assert(one(Analyzers.keywordLower(lit("Data/Part_1/File.JSON"))) == "data/part_1/file.json")
  }

  test("standard analyzer splits on non-alphanumerics and lowercases") {
    val toks = one(Analyzers.standardTokens(lit("Hello, World! x2")))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(toks.toList == List("hello", "world", "x2"))
  }

  test("keyword ismatch: prefix patterns and embedded wildcards") {
    assert(one(Analyzers.isMatchKeyword(lit("Partition_12/file"), "partition*")) == true)
    assert(one(Analyzers.isMatchKeyword(lit("other/file"), "partition*")) == false)
    assert(one(Analyzers.isMatchKeyword(lit("partition_12/file.json"), "part*12*json")) == true)
    assert(one(Analyzers.isMatchKeyword(lit("partition_12/file.json"), "part*13*json")) == false)
    // regex metacharacters in the pattern are literal
    assert(one(Analyzers.isMatchKeyword(lit("a.b/c"), "a.b*")) == true)
    assert(one(Analyzers.isMatchKeyword(lit("axb/c"), "a.b*")) == false)
  }

  test("exact (no wildcard) keyword pattern matches whole token only") {
    assert(one(Analyzers.isMatchKeyword(lit("ABC"), "abc")) == true)
    assert(one(Analyzers.isMatchKeyword(lit("abcd"), "abc")) == false)
  }
}
