package graft

import graft.operators.{RegexBank, TopPerGroup}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  val rules = Seq(
    RegexBank.Rule("high", "foo", 300),
    RegexBank.Rule("longer", "foo bar", 300),   // same prio, longer pattern wins
    RegexBank.Rule("low", "bar", 100))

  test("RegexBank: priority then pattern-length ordering, first match wins") {
    val df = Seq("xx foo bar xx", "only bar here", "nothing").toDF("s")
    val got = df.select(col("s"),
        RegexBank.bestMatchExpr(rules)(col("s")).as("k"))
      .as[(String, Option[String])].collect().toMap
    assert(got("xx foo bar xx").contains("longer"))
    assert(got("only bar here").contains("low"))
    assert(got("nothing").isEmpty)
  }

  test("RegexBank: UDF bank and codegen chain agree") {
    val df = Seq("xx foo bar xx", "only bar here", "FOO", "nothing").toDF("s")
    val both = df.select(
      RegexBank.bestMatchExpr(rules)(col("s")).as("a"),
      RegexBank.bestMatchChain(rules)(col("s")).as("b"))
    assert(both.filter(!(col("a") <=> col("b"))).count() == 0)
  }

  test("TopPerGroup.top1 is deterministic under ties") {
    val df = Seq((1, "a", 10), (1, "b", 10), (2, "c", 5)).toDF("grp", "id", "score")
    val got = TopPerGroup.top1(df, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc))
      .select("grp", "id").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 2 -> "c"))
  }
}
