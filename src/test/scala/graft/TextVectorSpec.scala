package graft

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._

class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams, short docs yield empty set") {
    val df = Seq("a b c d", "a b").toDF("s")
    val got = df.select(TextFns.shingles(col("s"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("ShingleSetExpr is identical to the HOF formulation on real docs") {
    val docs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(1, 2, 3, 5).foreach { n =>
      val mism = docs.select(
          TextFns.shingleSet(col("text"), n).as("a"),
          TextFns.shingleSetHof(col("text"), n).as("b"))
        .filter(!(col("a") <=> col("b")))
      assert(mism.count() == 0, s"n=$n")
    }
  }

  test("langId picks max-marker language with priority tie-break") {
    val markers = Seq("en" -> Seq("the"), "fr" -> Seq("le"))
    val df = Seq("the cat", "le chat", "nothing here", "the le").toDF("s")
    val got = df.select(TextFns.langId(col("s"), markers)).as[String].collect()
    assert(got.toSeq == Seq("en", "fr", "und", "en"))
  }

  test("fingerprint is invariant to case and space runs") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
    val r = df.select(
      TextFns.fingerprint(col("a")) === TextFns.fingerprint(col("b"))).as[Boolean].head()
    assert(r)
  }

  test("SimHashSig expression is bit-identical to the HOF formulation") {
    val docs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val mism = docs.select(
        TextFns.simhash64(col("text")).as("a"),
        TextFns.simhash64Hof(col("text")).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(mism.count() == 0)
  }

  test("simhash: identical texts agree, disjoint texts differ") {
    val df = Seq(("x y z w", "x y z w", "p q r s")).toDF("a", "b", "c")
    val row = df.select(
      TextFns.simhash64(col("a")) === TextFns.simhash64(col("b")),
      TextFns.simhash64(col("a")) === TextFns.simhash64(col("c"))).head()
    assert(row.getBoolean(0) && !row.getBoolean(1))
  }

  test("MinHashSig expression is bit-identical to the HOF hash chain") {
    val docs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFns.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val mism = docs.select(
        TextFns.minhashSignature(col("sh"), 32).as("a"),
        TextFns.minhashSignatureHof(col("sh"), 32).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(mism.count() == 0)
  }

  test("minhash signature: identical sets identical, length = numHashes") {
    val df = Seq(("a b c d e f", "a b c d e f")).toDF("a", "b")
    val sigs = df.select(
      TextFns.minhashSignature(TextFns.shingleSet(col("a"), 2), 16).as("sa"),
      TextFns.minhashSignature(TextFns.shingleSet(col("b"), 2), 16).as("sb"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(sigs._1.length == 16 && sigs._1 == sigs._2)
  }

  test("codegen dot product is bit-identical to the HOF fold") {
    val vecs = graft.SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorFns.toDouble(col("embedding")).as("v"))
    val mismatch = vecs.crossJoin(vecs.limit(3).select(col("v").as("w")))
      .select(VectorFns.dot(col("v"), col("w")).as("a"),
        VectorFns.dotHof(col("v"), col("w")).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(mismatch.count() == 0)
  }

  test("vector dot / cosine on known values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 4.0f, 4.0f))).toDF("a", "b")
    val (d, c) = df.select(
      VectorFns.dot(VectorFns.toDouble(col("a")), VectorFns.toDouble(col("b"))),
      VectorFns.cosine(VectorFns.toDouble(col("a")), VectorFns.toDouble(col("b"))))
      .as[(Double, Double)].head()
    assert(d == 18.0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("lshBucket: deterministic and equal for identical vectors") {
    val planes = VectorFns.hyperplanes(4, 3)
    val df = Seq((Seq(1.0f, 0.0f, 1.0f), Seq(1.0f, 0.0f, 1.0f))).toDF("a", "b")
    val (x, y) = df.select(
      VectorFns.lshBucket(VectorFns.toDouble(col("a")), planes),
      VectorFns.lshBucket(VectorFns.toDouble(col("b")), planes)).as[(Long, Long)].head()
    assert(x == y)
  }
}
