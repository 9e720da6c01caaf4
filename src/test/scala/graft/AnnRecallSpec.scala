package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Recall semantics of the approximate ANN family. The oracles hash-check
  * that each path computes ITS OWN semantics deterministically; this spec
  * pins the property that makes those semantics useful — the approximation
  * budget (nprobe / rerank shortlist) converges the answer to the exact
  * brute force, monotonically:
  *
  *  - IVF probing MORE lists can only improve recall (probe sets are
  *    nested prefixes of the centroid ranking, and the final scoring is
  *    exact cosine, so a superset candidate pool never loses a true
  *    neighbor it already had);
  *  - at full probe width / full-corpus rerank, IVF and PQ must EQUAL
  *    brute force triple-for-triple (same ranks, same tie-breaks);
  *  - SQ8's shortlist-then-exact-rerank reproduces brute force exactly on
  *    this corpus (quantization error is far below the neighbor gaps).
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val e =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = e.filter(col("vec_id") < 8)

  private def triples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("nbr_id").cast("long"),
        col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private lazy val exact = triples(Similarity.bruteForceTopK(e, queries, k = 5))
  private def recall(got: Set[(Long, Long, Long)]): Double = {
    val pairs = got.map(t => (t._1, t._2))
    val truth = exact.map(t => (t._1, t._2))
    pairs.intersect(truth).size.toDouble / truth.size
  }

  test("IVF recall is monotone in nprobe and exact at full probe width") {
    val cents = Similarity.trainIvfCentroids(e, initStride = 13L, iters = 3)
    assert(cents.size >= 4, s"fixture too small: ${cents.size} centroids")
    val r2 = recall(triples(Similarity.ivfTopKWithCentroids(
      e, queries, k = 5, centroids = cents, nprobe = 2)))
    val r4 = recall(triples(Similarity.ivfTopKWithCentroids(
      e, queries, k = 5, centroids = cents, nprobe = 4)))
    assert(r2 > 0.3, s"nprobe=2 recall degenerate: $r2")
    assert(r4 >= r2, s"recall fell as nprobe grew: $r2 -> $r4")
    val full = triples(Similarity.ivfTopKWithCentroids(
      e, queries, k = 5, centroids = cents, nprobe = cents.size))
    assert(full == exact, "full-probe IVF must equal brute force exactly")
  }

  test("SQ8 shortlist + exact rerank reproduces brute force on this corpus") {
    val got = triples(Similarity.sq8TopK(e, queries, k = 5,
      rerankFactor = 4, dim = 64))
    assert(got == exact)
  }

  test("PQ with a corpus-covering shortlist equals brute force; bounded shortlist keeps usable recall") {
    val cbs = Similarity.trainPqCodebooks(e, m = 4, subDim = 16,
      initStride = 13L, ksub = 16, iters = 2)
    val n = e.count().toInt
    val full = triples(Similarity.pqTopK(e, queries, k = 5,
      codebooks = cbs, m = 4, subDim = 16, rerankFactor = (n / 5) + 1))
    assert(full == exact, "corpus-wide PQ shortlist must equal brute force")
    val bounded = recall(triples(Similarity.pqTopK(e, queries, k = 5,
      codebooks = cbs, m = 4, subDim = 16, rerankFactor = 8)))
    assert(bounded > 0.3, s"PQ rerankFactor=8 recall degenerate: $bounded")
  }
}
