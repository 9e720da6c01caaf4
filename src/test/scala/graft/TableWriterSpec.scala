package graft

import graft.core.{Model, ModelRegistry}
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

class TableWriterSpec extends SparkSpec {
  import spark.implicits._

  test("incremental upsert overwrites only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val w = new TableWriter(dir)
    val day1 = Seq(("2022-01-01", "a", 1.0), ("2022-01-02", "b", 2.0))
      .toDF("date_period", "k", "v")
    w.upsertPartitions(day1, "inc", Seq("date_period"))

    // re-load day 2 with corrected values + a new day 3
    val day2fix = Seq(("2022-01-02", "b", 20.0), ("2022-01-03", "c", 3.0))
      .toDF("date_period", "k", "v")
    w.upsertPartitions(day2fix, "inc", Seq("date_period"))

    val got = w.read(spark, "inc")
      .select("date_period", "k", "v").as[(String, String, Double)]
      .collect().toSet
    assert(got == Set(
      ("2022-01-01", "a", 1.0),   // untouched partition survives
      ("2022-01-02", "b", 20.0),  // replaced
      ("2022-01-03", "c", 3.0)))  // appended
  }

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
