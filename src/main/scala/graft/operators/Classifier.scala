package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trained quality classifier — the CCNet/GPT-3-style logistic
  * regression over hashed bag-of-words features, trained BY THE ENGINE
  * with fixed-step batch gradient descent so the whole train→score→select
  * pipeline is one deterministic, oracle-replayable computation (no
  * external model artifact, no RNG: zero-init weights, full-batch
  * gradients, a fixed iteration count).
  *
  * Features: the shared polynomial token hash folded into `buckets` bins,
  * length-normalized (cnt/dl — raw counts would saturate the sigmoid on
  * long documents), plus a bias pseudo-feature at bin −1 with x = 1 so
  * the intercept flows through the SAME join/aggregate shapes as every
  * other weight. Labels: `targetPred`. Update rule per iteration:
  * w ← w − lr · (Σ_docs (σ(w·x) − y)·x) / N.
  *
  * Determinism: the two reductions (per-doc w·x, per-bin gradient) are
  * DECIMAL(38,18)-cast sums — order-independent under any partitioning;
  * everything between them is scalar IEEE double arithmetic written
  * identically on both engines. The transcendentals (exp inside σ) carry
  * ~1-ulp cross-engine slack that compounds through the iterations to
  * ~1e-14 relative on the final scores, so the contract output is the
  * RANK — the BM25/DSIR/PageRank discipline: token-identical documents
  * get bit-identical scores within each engine and break on doc_id;
  * genuinely different documents differ by whole features.
  *
  * Scale shape: one (doc, bin) count shuffle builds the features; each
  * iteration is two broadcast-join + combine-agg passes over the
  * (corpus × ≤buckets+1)-bounded feature frame (persisted once); the
  * model is `buckets`+1 driver doubles per iteration (the same "trained
  * literals" pattern as the IVF centroids); selection is TakeOrdered.
  * Nothing corpus-sized crosses the driver.
  */
object Classifier {

  def logisticQualityTopK(docs: DataFrame, targetPred: Column,
      buckets: Int = 16, iters: Int = 3, lr: Double = 0.5, k: Int = 200,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDoc = docs
      .select(col(idCol).as("doc_id"), targetPred.as("y"),
        explode(split(col(textCol), " ")).as("term"))
      .withColumn("b",
        (graft.functions.TextFns.polyTokenHash(col("term"))
          % lit(buckets.toLong)).cast("int"))
      .groupBy("doc_id", "y", "b")
      .agg(count(lit(1)).as("cnt"))
    val dl = perDoc.groupBy("doc_id", "y")
      .agg(sum(col("cnt")).as("dl"))
    val feat = perDoc.join(dl.select("doc_id", "dl"), Seq("doc_id"))
      .select(col("doc_id"), col("y"), col("b"),
        (col("cnt").cast("double") / col("dl").cast("double")).as("x"))
      .unionByName(dl.select(col("doc_id"), col("y"),
        lit(-1).as("b"), lit(1.0).as("x")))
      .persist()
    val n = dl.count() // one driver long: the corpus size

    var w: Map[Int, Double] =
      ((-1 until buckets).map(_ -> 0.0)).toMap
    // the weight vector attaches as a constant-folded array subscript
    // (b ∈ [-1, buckets) → 1-based index b+2) instead of a broadcast
    // join: one exchange-free Project per score pass, not a
    // BroadcastExchange + BroadcastHashJoin per iteration. Arithmetic
    // is unchanged (same w·x per row, exact decimal sum — order-free).
    def score(wm: Map[Int, Double]): DataFrame = {
      val arr = Array.tabulate(buckets + 1)(i => wm(i - 1))
      feat.withColumn("w", element_at(lit(arr), col("b") + lit(2)))
        .groupBy("doc_id", "y")
        .agg(sum((col("w") * col("x")).cast("decimal(38,18)")).as("zs"))
        .select(col("doc_id"), col("y"), col("zs").cast("double").as("z"))
    }
    for (_ <- 1 to iters) {
      val resid = score(w).select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))
          - when(col("y"), lit(1.0)).otherwise(lit(0.0))).as("r"))
      val grads = feat.join(resid, Seq("doc_id"))
        .groupBy("b")
        .agg(sum((col("r") * col("x")).cast("decimal(38,18)")).as("g"))
        .collect()
        .map(row => row.getAs[Int]("b")
          -> row.getAs[java.math.BigDecimal]("g").doubleValue()).toMap
      w = w.map { case (b, wv) =>
        b -> (wv - lr * (grads.getOrElse(b, 0.0) / n.toDouble))
      }
    }
    val out = score(w)
      .orderBy(col("z").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("z").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("y").as("is_tgt"))
      .transform(graft.core.Checkpoints.stable)
    feat.unpersist(blocking = false)
    out
  }
}
