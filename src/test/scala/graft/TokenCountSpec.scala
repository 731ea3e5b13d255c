package graft

import org.apache.spark.sql.functions._

import graft.functions.{TokenCount, TokenCountUtil}
import org.apache.spark.unsafe.types.UTF8String

class TokenCountSpec extends SparkSpecBase {

  private def u(s: String) = UTF8String.fromString(s)

  test("static counter handles separators, edges, and near-matches") {
    assert(TokenCountUtil.count(u("a b a  a"), u("a")) == 3)
    assert(TokenCountUtil.count(u("  a\tb\na "), u("a")) == 2)
    assert(TokenCountUtil.count(u("ab aba ab"), u("ab")) == 2)
    assert(TokenCountUtil.count(u(""), u("a")) == 0)
    assert(TokenCountUtil.count(u("aa"), u("a")) == 0)
  }

  test("expression matches the composed split/filter form on real data") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables(s, sf("sf0.001")).documents
    val both = docs.select(
      TokenCount($"text", lit("hash")).as("native"),
      size(filter(split($"text", "\\s+"), w => w === "hash"))
        .cast("long").as("composed"))
    assert(both.filter($"native" =!= $"composed").count() == 0)
  }

  test("token_count is SQL-registered via GraftExtensions") {
    val s = spark
    import s.implicits._
    graft.core.Tables(s, sf("sf0.001")).documents.createOrReplaceTempView("docs_tc")
    val total = s.sql(
      "SELECT sum(token_count(text, 'hash')) FROM docs_tc").head.getLong(0)
    val expected = graft.core.Tables(s, sf("sf0.001")).documents
      .select(sum(TokenCount($"text", lit("hash")))).head.getLong(0)
    assert(total == expected && total > 0)
  }

  test("expression stays inside whole-stage codegen") {
    val s = spark
    import s.implicits._
    val plan = graft.core.Tables(s, sf("sf0.001")).documents
      .select(TokenCount($"text", lit("hash")))
      .queryExecution.executedPlan
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert("""\*\(\d+\) Project \[token_count""".r
      .findFirstIn(plan.toString).isDefined,
      s"expected token_count inside a codegen'd (*-prefixed) Project:\n$plan")
  }
}
