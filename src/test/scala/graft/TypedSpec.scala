package graft

import graft.typed.TypedTables
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("typed lineitem: compile-checked fields, same counts as untyped") {
    val ds = TypedTables.lineitem(spark, dir)
    val typedCount = ds.filter(_.l_returnflag == "R").count()
    val untyped = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "R").count()
    assert(typedCount == untyped && typedCount > 0)
  }

  test("typed aggregation matches the DataFrame aggregation") {
    val ds = TypedTables.lineitem(spark, dir)
    val typed = ds.groupByKey(_.l_returnflag)
      .mapValues(l => l.l_quantity)
      .reduceGroups(_ + _)
      .collect().toMap
    val frame = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .as[(String, Double)].collect().toMap
    // quantities are integral doubles → both sums are exact
    assert(typed == frame)
  }

  test("typed join with joinWith keeps both sides typed") {
    val o = TypedTables.orders(spark, dir)
    val c = TypedTables.customer(spark, dir)
    val joined = o.joinWith(c, o("o_custkey") === c("c_custkey"))
    val row = joined.head()
    assert(row._1.o_custkey == row._2.c_custkey)
  }
}
