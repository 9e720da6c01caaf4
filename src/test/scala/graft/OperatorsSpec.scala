package graft

import graft.operators.{RegexBank, TopPerGroup}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  val rules = Seq(
    RegexBank.Rule("high", "foo", 300),
    RegexBank.Rule("longer", "foo bar", 300),   // same prio, longer pattern wins
    RegexBank.Rule("low", "bar", 100))

  test("RegexBank: priority then pattern-length ordering, first match wins") {
    val df = Seq("xx foo bar xx", "only bar here", "nothing").toDF("s")
    val got = df.select(col("s"),
        RegexBank.bestMatchExpr(rules)(col("s")).as("k"))
      .as[(String, Option[String])].collect().toMap
    assert(got("xx foo bar xx").contains("longer"))
    assert(got("only bar here").contains("low"))
    assert(got("nothing").isEmpty)
  }

  test("RegexBank: UDF bank and codegen chain agree") {
    val df = Seq("xx foo bar xx", "only bar here", "FOO", "nothing").toDF("s")
    val both = df.select(
      RegexBank.bestMatchExpr(rules)(col("s")).as("a"),
      RegexBank.bestMatchChain(rules)(col("s")).as("b"))
    assert(both.filter(!(col("a") <=> col("b"))).count() == 0)
  }

  test("RegexBank chain survives reference-scale branch counts (300 rules)") {
    // The reference's legacy classifier is a ~600-branch CASE
    // (card_merchants_model.sql:2-620); prove the codegen'd chain compiles
    // and first-match-wins holds at that depth.
    val manyRules = (1 to 300).map(i =>
      RegexBank.Rule(s"k$i", s"\\btoken$i\\b", 1000 - i))
    val df = Seq("has token7 here", "token299 and token300", "none").toDF("s")
    val got = df.select(
        RegexBank.bestMatchChain(manyRules)(col("s")).as("k"))
      .as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("k7"), Some("k299"), None))
    val gotUdf = df.select(
        RegexBank.bestMatchExpr(manyRules)(col("s")).as("k"))
      .as[Option[String]].collect()
    assert(gotUdf.toSeq == got.toSeq)
  }

  test("AsOfJoin.backward: latest at-or-before match per key, null when none") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 09:00:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1.0),
      ("u1", ts("2024-01-01 12:00:00"), 2.0), // equal ts → included
      ("u2", ts("2024-01-01 11:00:00"), 3.0)) // after left → no match
      .toDF("k", "t", "v")
    val got = graft.operators.AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None))
  }

  test("AsOfJoin.forward: earliest at-or-after match per key, null when none") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // next is 12:00 (09:30 is past)
      (2L, "u1", ts("2024-01-01 12:00:00")), // equal ts → included
      (3L, "u2", ts("2024-01-01 12:00:00"))) // nothing after → null
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1.0),
      ("u1", ts("2024-01-01 12:00:00"), 2.0),
      ("u2", ts("2024-01-01 11:00:00"), 3.0))
      .toDF("k", "t", "v")
    val got = graft.operators.AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> None))
  }

  test("d26 chunking: boundary token counts produce covering windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    Seq(
      (1L, (1 to 64).map(i => s"t$i").mkString(" "), "en", "s", 0L),
      (2L, (1 to 65).map(i => s"t$i").mkString(" "), "en", "s", 0L),
      (3L, "solo", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d26_doc_chunking")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
      .groupBy(_._1)
    // exactly at the window size: ONE chunk, not an empty trailer
    assert(got(1L).length == 1 && got(1L).head._3 == 64L)
    // one past: windows at 0 (64 toks) and 48 (17 toks) — every token
    // covered, the short tail window reaches the final token
    assert(got(2L).map(c => (c._2, c._3)).toSet == Set((0L, 64L), (1L, 17L)))
    assert(got(2L).find(_._2 == 1L).get._5 == "t65")
    // a short doc is one whole chunk
    assert(got(3L).head._3 == 1L && got(3L).head._4 == "solo")
  }

  test("Snapshot.scd2: the full transition matrix over two runs") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("k", "v")
    // 1 unchanged; 2 changed; 3 deleted; 4 null→value change; 5 new
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e")).toDF("k", "v")
    val s1 = graft.operators.Snapshot.scd2(None, v1, "k", Seq("v"), d1)
    val s2 = graft.operators.Snapshot.scd2(Some(s1), v2, "k", Seq("v"), d2)
      .select(col("k"), col("v"),
        col("valid_from").cast("string"), col("valid_to").cast("string"))
      .as[(Long, String, String, String)].collect().toSet
    assert(s2 == Set(
      (1L, "a", "2024-01-01", null),              // unchanged: open survives
      (2L, "b", "2024-01-01", "2024-02-01"),      // changed: old closes
      (2L, "B", "2024-02-01", null),              //          new opens
      (3L, "c", "2024-01-01", null),              // deleted: stays open (dbt default)
      (4L, null, "2024-01-01", "2024-02-01"),     // null→value IS a change
      (4L, "d", "2024-02-01", null),
      (5L, "e", "2024-02-01", null)))             // new key opens
    // hard-delete variant closes the disappeared key instead
    val s2h = graft.operators.Snapshot.scd2(Some(s1), v2, "k", Seq("v"), d2,
        closeDeleted = true)
      .filter(col("k") === 3L)
      .select(col("valid_to").cast("string")).as[String].collect().toSeq
    assert(s2h == Seq("2024-02-01"))
  }

  test("SnapshotStore: append-only run partitions, idempotent re-run") {
    import graft.operators.SnapshotStore
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("k", "v")
    val wh = java.nio.file.Files.createTempDirectory("graft_snapstore_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1)
      val run1Dir = java.nio.file.Paths.get(writer.path("t"), "snap_run=2024-01-01")
      def run1Files: Map[String, (Long, Long)] = {
        val s = java.nio.file.Files.list(run1Dir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getFileName.toString ->
            (java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
        finally s.close()
      }
      val before = run1Files
      val snap2 = SnapshotStore.run(spark, writer, "t", v2, "k", Seq("v"), d2)
      // append-only: run 2 never rewrote run 1's partition
      assert(run1Files == before && before.nonEmpty)
      val expect = Set(
        (1L, "a", "2024-01-01", null),
        (2L, "b", "2024-01-01", "2024-02-01"),
        (2L, "B", "2024-02-01", null),
        (3L, "c", "2024-01-01", null),
        (5L, "e", "2024-02-01", null))
      def presented(df: org.apache.spark.sql.DataFrame) = df
        .select(col("k"), col("v"),
          col("valid_from").cast("string"), col("valid_to").cast("string"))
        .as[(Long, String, String, String)].collect().toSet
      assert(presented(snap2) == expect)
      // idempotent re-run of the latest asOf: same source, same date →
      // identical reconstruction (partition rewritten with equal content)
      val snap2again = SnapshotStore.run(spark, writer, "t", v2, "k", Seq("v"), d2)
      assert(presented(snap2again) == expect)
      assert(run1Files == before)
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("TopPerGroup.top1 is deterministic under ties") {
    val df = Seq((1, "a", 10), (1, "b", 10), (2, "c", 5)).toDF("grp", "id", "score")
    val got = TopPerGroup.top1(df, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc))
      .select("grp", "id").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a", 2 -> "c"))
  }
}
