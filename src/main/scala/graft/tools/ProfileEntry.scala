package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-job timing breakdown of ONE SparkEntry query: runs the entry
  * exactly like Bench (same session settings, `.count()` action, cold +
  * steady pass) with a listener that prints every Spark job's duration,
  * task count, and call site — the §1 "where is the time actually going"
  * measurement for entries whose cost is many tiny jobs rather than one
  * big stage.
  *
  * Usage: runMain graft.tools.ProfileEntry <sfDir> <entryName> [runs]
  */
object ProfileEntry {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var echo = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          val ntasks = j.stageInfos.map(_.numTasks).sum
          jobStart.put(j.jobId, (System.nanoTime(), site, ntasks))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(j.jobId)).foreach { case (t0, site, nt) =>
            if (echo) {
              val ms = (System.nanoTime() - t0) / 1e6
              println(f"[job] ${j.jobId}%4d ${ms}%8.1f ms  tasks=$nt%4d  $site")
            }
          }
        }
      })

    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    val fn = graft.SparkEntry.queries(name)
    (0 until runs).foreach { i =>
      echo = i == runs - 1 // per-job echo on the steady pass only
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext)
      println(f"[run] $name pass $i: $sec%.3f s")
    }
    graft.SparkEntry.releaseSessionCaches()
    spark.stop()
  }
}
