package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary: does AQE coalesce explicit-N repartitions? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.add(s"id=${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks}")
      })

    val slowUdf = udf((s: String) => { Thread.sleep(0, 1000); s.length })
    spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .createOrReplaceTempView("o")
    val base = spark.sql("SELECT o_orderkey AS k, o_orderpriority AS c FROM o")

    println("--- round-robin repartition(16)")
    base.repartition(16).withColumn("n", slowUdf(col("c")))
      .agg(sum("n")).collect()
    println("--- keyed repartition(16, k)")
    base.repartition(16, col("k")).withColumn("n", slowUdf(col("c")))
      .agg(sum("n")).collect()
    Thread.sleep(3000) // let async listener events drain
    import scala.jdk.CollectionConverters._
    stages.asScala.foreach(s => println(s"[stage] $s"))
    spark.stop()
  }
}
