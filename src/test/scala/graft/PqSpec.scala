package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codebooks: m subspaces, ksub centroids, subDim-wide") {
    val cbs = Similarity.trainPqCodebooks(emb, m = 4, subDim = 16,
      initStride = 13L, ksub = 16, iters = 2)
    assert(cbs.map(_._1).distinct.sorted == Seq(0, 1, 2, 3))
    val perSub = cbs.groupBy(_._1).map(_._2.size).toSet
    assert(perSub == Set(16), s"codebooks not ksub-sized: $perSub")
    assert(cbs.forall(_._3.size == 16))
    // centroid ids are the stride-selected vec_ids, shared across subspaces
    val ids = cbs.filter(_._1 == 0).map(_._2).sorted
    assert(ids == cbs.filter(_._1 == 3).map(_._2).sorted)
    assert(ids.forall(i => i % 13 == 0 && i < 13 * 16))
  }

  test("training moves centroids off their init (it actually iterates)") {
    val init = Similarity.trainPqCodebooks(emb, 4, 16, 13L, 16, iters = 0)
    val trained = Similarity.trainPqCodebooks(emb, 4, 16, 13L, 16, iters = 2)
    assert(init.size == trained.size)
    val moved = init.zip(trained).count { case ((_, _, a), (_, _, b)) => a != b }
    assert(moved > 0, "two Lloyd rounds changed nothing — training is a no-op")
  }

  test("PQ top-k with exact rerank recovers most brute-force neighbors") {
    val queries = emb.filter(col("vec_id") < 8)
    val cbs = Similarity.trainPqCodebooks(emb, 4, 16, 13L, 16, 2)
    val pq = Similarity.pqTopK(emb, queries, k = 5, cbs, m = 4, subDim = 16,
      rerankFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.5, f"PQ recall@5 $recall%.2f below 0.5 — " +
      "quantization is destroying the ranking")
  }

  test("reconstruction error is bounded: approx sim correlates with exact") {
    // over the shortlist the approx ordering should put at least one true
    // top-1 neighbor in every query's shortlist (rerank can only fix what
    // the shortlist kept)
    val queries = emb.filter(col("vec_id") < 8)
    val cbs = Similarity.trainPqCodebooks(emb, 4, 16, 13L, 16, 2)
    val pqTop1 = Similarity.pqTopK(emb, queries, k = 1, cbs, 4, 16,
      rerankFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pqTop1.size == 8, s"missing queries in PQ output: ${pqTop1.keys}")
  }
}
