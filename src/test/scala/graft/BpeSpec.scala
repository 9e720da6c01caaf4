package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(ms: Seq[(String, String)]) = {
    val m = new java.util.HashMap[String, Integer]()
    ms.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  test("train: most-frequent pair, lexicographic tie-break, merge-all") {
    val merges = Bpe.train(Map("abab" -> 2L, "ab" -> 1L), 4)
    // (a,b) count 5 beats (b,a) count 2; then only (ab,ab) remains
    assert(merges == IndexedSeq(("a", "b"), ("ab", "ab")))
    // deterministic re-run
    assert(merges == Bpe.train(Map("abab" -> 2L, "ab" -> 1L), 4))
    // tie-break: "xy" and "yx" pairs both count 1 → lexicographically
    // smallest pair (x,y) wins round 1
    assert(Bpe.train(Map("xyx" -> 1L), 1).head == (("x", "y")))
  }

  test("encode: leftmost occurrence of the lowest-rank pair per step") {
    val rk = ranksOf(Seq(("a", "b"), ("ab", "ab")))
    assert(Bpe.encode("abab", rk) == IndexedSeq("abab"))
    assert(Bpe.encode("aab", rk) == IndexedSeq("a", "ab"))
    assert(Bpe.encode("ba", rk) == IndexedSeq("b", "a"))
    assert(Bpe.encode("", rk).isEmpty)
    // rank order matters: with (b,c) ranked above (a,b), "abc" merges bc
    val rk2 = ranksOf(Seq(("b", "c"), ("a", "b")))
    assert(Bpe.encode("abc", rk2) == IndexedSeq("a", "bc"))
  }

  test("bundled merge table: loads, and retraining on its corpus reproduces it") {
    assert(Bpe.merges.size == 48)
    val wordCounts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Bpe.train(wordCounts, 48) == Bpe.merges)
  }

  test("token ids and position-weighted checksum pin the ordered sequence") {
    // single-codepoint tokens are codepoints — for ANY script: the merge
    // id space starts past the Unicode range so no codepoint collides
    assert(Bpe.tokenId("a") == 'a'.toLong)
    assert(Bpe.tokenId("é") == 0xE9L)
    assert(Bpe.tokenId("😀") == 0x1F600L) // surrogate pair
    // multi-char tokens are MergeIdBase + first producing merge's rank
    val erRank = Bpe.merges.indexWhere { case (a, b) => a + b == "er" }
    assert(erRank >= 0 &&
      Bpe.tokenId("er") == Bpe.MergeIdBase.toLong + erRank)
    assert(Bpe.MergeIdBase > Character.MAX_CODE_POINT)
    // a multi-char non-merge token is an error, not an NPE
    intercept[IllegalArgumentException](Bpe.tokenId("zzqq"))
    // checksum is position-sensitive: swapping two words changes it even
    // though the token multiset is identical
    val ab = Bpe.idChecksumText("key agg")
    val ba = Bpe.idChecksumText("agg key")
    assert(ab != ba && ab > 0 && ba > 0)
    // column form matches driver-side, null-safe
    val got = Seq(Some("key agg"), None).toDF("text")
      .select(Bpe.bpeIdChecksum(col("text")).as("c"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(ab), None))
  }

  test("bpeTokenCount column matches the driver-side count, null-safe") {
    val df = Seq(Some("key agg row"), Some(""), None)
      .toDF("text")
      .select(Bpe.bpeTokenCount(col("text")).as("n"))
    val got = df.as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(Bpe.countTokensText("key agg row")), Some(0L), None))
    // merged words cost fewer tokens than characters, more than words
    val n = Bpe.countTokensText("key agg row")
    assert(n >= 3 && n < "key agg row".length)
  }
}
