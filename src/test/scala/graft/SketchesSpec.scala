package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 20000).map { i =>
    (s"g${i % 3}", (i % (1000 + (i % 3) * 2000)).toLong, (i % 500).toDouble)
  }.toDF("g", "uid", "v")

  test("KMV estimate within 15% of the exact distinct count") {
    val est = Sketches.kmvDistinct(df, col("g"), col("uid"), 256, "g", "e")
      .as[(String, Double)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct(col("uid")))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n.toDouble < 0.15,
        s"$g: est=${est(g)} exact=$n")
    }
  }

  test("KMV is exact below k distinct values") {
    val small = (1 to 100).map(i => ("a", (i % 40).toLong)).toDF("g", "uid")
    val est = Sketches.kmvDistinct(small, col("g"), col("uid"), 256, "g", "e")
      .as[(String, Double)].head()
    assert(est._2 == 40.0)
  }

  test("histogram quantiles within one bucket width of exact percentiles") {
    val q = Sketches.histQuantiles(df, col("g"), col("v"), 1000,
        Seq("p50" -> 0.5, "p99" -> 0.99))
      .withColumnRenamed("__g", "g")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.99)"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val width = 499.0 / 1000 // (max-min)/buckets
    exact.foreach { case (g, (p50, p99)) =>
      assert(math.abs(q(g)._1 - p50) <= 2 * width, s"$g p50 ${q(g)._1} vs $p50")
      assert(math.abs(q(g)._2 - p99) <= 2 * width, s"$g p99 ${q(g)._2} vs $p99")
    }
  }

  test("sketches merge correctly across partitioning layouts") {
    // same data, different partition counts -> identical sketch outputs
    val a = Sketches.kmvDistinct(df.repartition(1), col("g"), col("uid"), 64, "g", "e")
      .as[(String, Double)].collect().toMap
    val b = Sketches.kmvDistinct(df.repartition(17), col("g"), col("uid"), 64, "g", "e")
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }
}
