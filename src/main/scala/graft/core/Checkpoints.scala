package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lineage truncation with a cluster-grade option. `localCheckpoint()` is
  * the right local default — no HDFS round-trip — but its blocks live
  * unreplicated on the executors that computed them: on a real cluster a
  * lost executor kills the job instead of recomputing (SCALE.md "Knobs").
  * With `spark.graft.reliableCheckpoint=true` every graft call site uses
  * reliable `checkpoint()` instead, writing blocks to the (fault-tolerant)
  * checkpoint dir; if none is set, one is created under
  * `spark.graft.checkpointDir` (default: a session-scoped temp dir — on a
  * cluster point it at durable shared storage).
  */
object Checkpoints {

  def reliableRequested(df: Dataset[_]): Boolean =
    df.sparkSession.conf
      .getOption("spark.graft.reliableCheckpoint").contains("true")

  /** Truncate `df`'s lineage: localCheckpoint by default, reliable
    * checkpoint under the session flag. Both are eager.
    */
  def stable(df: DataFrame): DataFrame =
    if (!reliableRequested(df)) df.localCheckpoint()
    else {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = df.sparkSession.conf.getOption("spark.graft.checkpointDir")
          .getOrElse(java.nio.file.Files
            .createTempDirectory("graft_ckpt_").toString)
        sc.setCheckpointDir(dir)
      }
      df.checkpoint()
    }
}
