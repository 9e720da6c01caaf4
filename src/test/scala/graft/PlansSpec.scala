package graft

import graft.functions.VectorFns
import graft.plans.RewriteDotProduct
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("RewriteDotProduct turns the HOF fold into graft_dot, same results") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ RewriteDotProduct
      // parquet-backed source: a literal local relation would be constant-
      // folded away before the rule could fire
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(VectorFns.toDouble(col("embedding")).as("v"))
        .select(VectorFns.dotHof(col("v"), col("v")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
      assert(df.count() > 0)

      // result equivalence on real embeddings
      val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(VectorFns.toDouble(col("embedding")).as("v")).limit(50)
      val viaHof = vecs.crossJoin(vecs.limit(2).select(col("v").as("w")))
        .select(VectorFns.dotHof(col("v"), col("w")).as("d"))
      val viaExpr = vecs.crossJoin(vecs.limit(2).select(col("v").as("w")))
        .select(VectorFns.dot(col("v"), col("w")).as("d"))
      assert(viaHof.exceptAll(viaExpr).isEmpty)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }
}
