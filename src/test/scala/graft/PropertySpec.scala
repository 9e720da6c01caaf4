package graft

import graft.core.Grain
import graft.functions.TextFns
import graft.operators.{Dedup, Rollups}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5) over ScalaCheck generators with
  * deterministic seeds: rollup totals are grain-invariant, UNION-distinct is
  * idempotent, Jaccard is bounded and exact-dup pairs hit 1.0, fingerprint
  * normalization is idempotent.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  val dateGen: Gen[String] = for {
    m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield f"2022-$m%02d-$d%02d"

  val rowsGen: Gen[List[(String, Double)]] =
    Gen.listOfN(30, Gen.zip(dateGen,
      Gen.choose(0.0, 500.0).map(v => math.round(v * 100) / 100.0)))

  test("rollup invariant: total is identical across every grain") {
    (1L to 5L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("d", "amt").select(to_date(col("d")).as("d"), col("amt"))
      val totals = Grain.all.map { g =>
        Rollups.measureRollup(df, col("d"), g, Nil,
            Seq(sum(col("amt").cast("decimal(18,2)")).as("t")))
          .agg(sum(col("t")).cast("double")).as[Double].head()
      }
      assert(totals.distinct.size == 1, s"seed=$seed totals=$totals")
    }
  }

  test("union-distinct is idempotent and order-insensitive") {
    (1L to 5L).foreach { seed =>
      val xs = sample(Gen.listOfN(20, Gen.choose(1, 6)), seed)
      val a = xs.toDF("x")
      val once = a.union(a).distinct()
      val twice = a.union(a).union(a).distinct()
      assert(once.count() == xs.distinct.size.toLong)
      assert(twice.exceptAll(once).isEmpty)
    }
  }

  val wordGen: Gen[String] = Gen.oneOf("spark", "table", "row", "scan", "agg",
    "fast", "slow", "key", "value", "join")
  val docGen: Gen[String] = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("jaccard bounded in (0,1]; duplicated docs pair at exactly 1.0") {
    (1L to 3L).foreach { seed =>
      val docs = sample(Gen.listOfN(5, docGen), seed)
      val withDup = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
        ((docs.length.toLong, docs.head))
      val pairs = Dedup.ngramJaccardPairs(withDup.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.0, maxDocFreq = 100)
      val js = pairs.select("jaccard").as[Double].collect()
      assert(js.forall(j => j > 0.0 && j <= 1.0), s"seed=$seed")
      val dup = pairs.filter(col("id_a") === 0L &&
        col("id_b") === docs.length.toLong).select("jaccard").as[Double].collect()
      assert(dup.length == 1 && dup.head == 1.0, s"seed=$seed dup=${dup.toSeq}")
    }
  }

  test("fingerprint: whitespace/case normalization is idempotent") {
    (1L to 5L).foreach { seed =>
      val doc = sample(docGen, seed)
      val pad = 1 + (seed % 4).toInt
      val messy = doc.toUpperCase.replace(" ", " " * pad)
      val (a, b) = Seq((messy, doc)).toDF("a", "b")
        .select(TextFns.fingerprint(col("a")), TextFns.fingerprint(col("b")))
        .as[(Long, Long)].head()
      assert(a == b, s"seed=$seed")
    }
  }
}
