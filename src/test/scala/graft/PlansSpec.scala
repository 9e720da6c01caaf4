package graft

import graft.functions.VectorFns
import graft.plans.RewriteDotProduct
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("RewriteDotProduct turns the HOF fold into graft_dot, same results") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ RewriteDotProduct
      // parquet-backed source: a literal local relation would be constant-
      // folded away before the rule could fire
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(VectorFns.toDouble(col("embedding")).as("v"))
        .select(VectorFns.dotHof(col("v"), col("v")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
      assert(df.count() > 0)

      // result equivalence on real embeddings
      val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(VectorFns.toDouble(col("embedding")).as("v")).limit(50)
      val viaHof = vecs.crossJoin(vecs.limit(2).select(col("v").as("w")))
        .select(VectorFns.dotHof(col("v"), col("w")).as("d"))
      val viaExpr = vecs.crossJoin(vecs.limit(2).select(col("v").as("w")))
        .select(VectorFns.dot(col("v"), col("w")).as("d"))
      assert(viaHof.exceptAll(viaExpr).isEmpty)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("RewriteDotProduct does NOT fire on sum-of-squares (x*x) folds") {
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ RewriteDotProduct
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(VectorFns.toDouble(col("embedding")).as("v"))
        .select(aggregate(zip_with(col("v"), col("v"), (x, _) => x * x),
          lit(0.0), (acc, e) => acc + e).as("sumsq"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_dot"), s"false rewrite:\n$optimized")
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("DotProduct NULL parity: unequal lengths and null elements") {
    import graft.SparkTestBase.spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val both = df.select(
      VectorFns.dot(col("a"), col("b")).as("x"),
      VectorFns.dotHof(col("a"), col("b")).as("y")).head()
    assert(both.isNullAt(0) && both.isNullAt(1))
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("x"),
        VectorFns.dotHof(col("a"), col("b")).as("y")).head()
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("d32 LM plan: model rides joins, never plan literals; bigram side broadcast") {
    val df = SparkEntry.queries("d32_lm_score")(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the old design embedded the full unigram+bigram vocabulary as two
    // map(...) literals — plan size grew with the corpus; the model-table
    // design keeps the plan O(1) regardless of vocabulary
    assert(!optimized.contains("map("),
      "vocabulary-sized map literal leaked back into the LM plan")
    assert(optimized.length < 50000,
      s"LM plan is ${optimized.length} chars — looks vocabulary-sized")
    assert(df.collect().nonEmpty)
    val physical = df.queryExecution.executedPlan.toString
    // the cutoff-bounded kept-bigram model table must ride a broadcast
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
  }

  test("q38 plan shape: one chain node, folded probe array, codegen'd") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders_legacy")
    val df = SparkEntry.queries("q38_merchants_legacy")(
      spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the classifier is ONE expression node, not a 532-branch CaseWhen
    assert(optimized.contains("ilike_chain_match"), optimized.take(500))
    assert("CASE WHEN".r.findAllIn(optimized).size < 20,
      "probe/branch CASEs leaked into the optimized plan")
    // the probe array constant-folded: no array(...) constructor survives
    assert(!optimized.contains("array('"),
      "probe array literal was not constant-folded")
    // the row path stays inside whole-stage codegen (run first — AQE only
    // finalizes stages on execution)
    assert(df.collect().nonEmpty) // df's OWN execution, not a derived count
    val physical = df.queryExecution.executedPlan.toString
    // "*(n)" marks WholeStageCodegen stages in the compact plan string; the
    // chain-classifier projection must be inside one
    assert(physical.linesIterator.exists(l =>
      l.contains("*(") && l.contains("ilike_chain_match")), physical.take(2000))
  }

  test("lexical serving plans rank through the bounded-heap aggregate, no per-query window") {
    // the 100 TB shape pin for v10/v21/v14 (r9 verdict's one weak): a
    // `row_number over partitionBy(query_id)` rank puts one query's
    // ENTIRE candidate set in a single task; the serving paths must rank
    // through TopKRankAggregator (map-side ≤k rows per partition) so the
    // final merge sees ≤ partitions×k rows — asserted on the physical
    // plan: no Window node anywhere, and the rank aggregate present
    import graft.operators.Retrieval
    import graft.sources.TableWriter
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plantopk").toString
    val w = new TableWriter(dir)
    Retrieval.buildBm25Index(docs, w, "docs")
    Retrieval.buildPositionalIndex(docs, w, "docs")
    val qs = Retrieval.queryTerms(docs, col("doc_id") % 13 === 0, 5)
    val phrases = docs.filter(col("doc_id") % 13 === 0
        && size(split(col("text"), " ")) >= 3)
      .select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 3).as("terms"))
    val serving = Seq(
      "index" -> Retrieval.queryBm25Index(spark, w, "docs", qs, k = 5),
      "maxscore" -> Retrieval.queryBm25IndexMaxScore(spark, w, "docs", qs, k = 5),
      "phrase" -> Retrieval.phraseQuery(spark, w, "docs", phrases, k = 5))
    for ((name, df) <- serving) {
      assert(df.collect().nonEmpty, s"$name: empty serving result")
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Window"),
        s"$name: a per-query window rank is back in the serving plan\n" +
          physical.take(2000))
      assert(physical.contains("topkrankaggregator"),
        s"$name: bounded-heap rank aggregate missing from the plan\n" +
          physical.take(2000))
    }
  }

  test("ANN serving ranks through the bounded heap; windows only on K-bounded probe frames") {
    // the IVF serving twin of the lexical pin: a query's probed-list
    // candidate mass (~nprobe·N/K rows at scale) must never sort in a
    // single task. The centroid-probe crank windows REMAIN — their
    // per-query partition is K rows, an index design parameter, not
    // corpus-scaled — so the pin is: the heap aggregate is present, and
    // no row_number orders by the candidate score (sim#/asim#; the
    // probe windows order by cent_sim#)
    import graft.operators.Similarity
    import graft.sources.TableWriter
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("planivfk").toString
    val w = new TableWriter(dir)
    Similarity.buildIvfIndex(e, cents, w, "emb")
    val df = Similarity.queryIvfIndex(spark, w, "emb",
      e.filter(col("vec_id") < 8), k = 5, nprobe = 2)
    assert(df.collect().nonEmpty)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("topkrankaggregatord"),
      "bounded-heap double-score rank aggregate missing\n" + physical.take(2000))
    assert(!physical.linesIterator.exists(l =>
        l.contains("row_number") && l.contains(" sim#")),
      "a per-query window over the candidate sims is back\n" + physical.take(2000))
  }
}
