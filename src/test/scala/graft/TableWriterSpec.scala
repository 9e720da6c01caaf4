package graft

import graft.core.{Model, ModelRegistry}
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

class TableWriterSpec extends SparkSpec {
  import spark.implicits._

  test("mergeByKey: upsert semantics, idempotent, bucket-scoped rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val w = new TableWriter(dir)
    // keys 2 and 18 share bucket 2 (mod 16); key 1 lives in bucket 1
    val base = Seq((1L, "a"), (2L, "b"), (18L, "c")).toDF("k", "v")
    w.mergeByKey(spark, "m", base, "k")
    val bucket2 = java.nio.file.Paths.get(w.path("m"), "__bucket=2")
    def files(p: java.nio.file.Path): Map[String, Long] = {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(f => f.getFileName.toString ->
            java.nio.file.Files.getLastModifiedTime(f).toMillis).toMap
      } finally s.close()
    }
    val before = files(bucket2)
    // batch touching only bucket 1: update key 1, insert key 17
    val batch = Seq((1L, "A"), (17L, "d")).toDF("k", "v")
    w.mergeByKey(spark, "m", batch, "k")
    val got = w.read(spark, "m").select("k", "v").as[(Long, String)]
      .collect().toSet
    assert(got == Set((1L, "A"), (2L, "b"), (18L, "c"), (17L, "d")))
    // bucket 2 was neither read-rewritten nor touched
    assert(files(bucket2) == before && before.nonEmpty)
    // idempotent re-apply
    w.mergeByKey(spark, "m", batch, "k")
    assert(w.read(spark, "m").select("k", "v").as[(Long, String)]
      .collect().toSet == got)
  }

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
