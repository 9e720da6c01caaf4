package graft

import graft.core.{Model, ModelRegistry}
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

class TableWriterSpec extends SparkSpec {
  import spark.implicits._

  test("materialized DAG: partitioned write, read-back, partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val writer = new TableWriter(dir)

    val reg = new ModelRegistry
    reg.register(Model("facts") { (s, _) =>
      import s.implicits._
      Seq(("2022-01-01", "a", 1.0), ("2022-01-01", "b", 2.0),
        ("2022-02-01", "a", 3.0))
        .toDF("date_period", "k", "v")
    })
    reg.register(Model("rollup", Seq("facts")) { (_, in) =>
      in("facts").groupBy("date_period").agg(sum("v").as("total"))
    })

    val built = reg.runAll(spark, Map.empty, Some(writer),
      Map("facts" -> Seq("date_period")))
    assert(built("rollup").count() == 2)

    // partition layout exists on disk and pruning reaches the scan
    assert(new java.io.File(s"$dir/facts/date_period=2022-01-01").isDirectory)
    val pruned = writer.read(spark, "facts")
      .filter(col("date_period") === "2022-01-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(date_period"))
    assert(pruned.count() == 2)
  }
}
