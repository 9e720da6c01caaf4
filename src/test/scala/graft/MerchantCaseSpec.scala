package graft

import graft.models.MerchantCase
import graft.models.MerchantCase.Term
import org.apache.spark.sql.functions._

class MerchantCaseSpec extends SparkSpec {
  import spark.implicits._

  test("all 532 reference branches load and parse") {
    assert(MerchantCase.branches.length == 532)
    // every branch has at least one positive term (probe derivable)
    MerchantCase.branches.foreach { b =>
      assert(b.condition.head.exists(!_.negated), s"branch ${b.seq}")
    }
  }

  test("condition parser handles the three grammar shapes") {
    assert(MerchantCase.parseCondition("description ilike '%X%'") ==
      Seq(Seq(Term("%X%", negated = false))))
    assert(MerchantCase.parseCondition(
      "description ilike 'A%' or description ilike '%B'") ==
      Seq(Seq(Term("A%", negated = false)), Seq(Term("%B", negated = false))))
    assert(MerchantCase.parseCondition(
      "description ilike 'Amazon Prime%' and description not ilike '%VIDEO%'") ==
      Seq(Seq(Term("Amazon Prime%", negated = false),
        Term("%VIDEO%", negated = true))))
    // '' unescaping inside pattern literals
    assert(MerchantCase.parseCondition("description ilike '%O''HARE%'") ==
      Seq(Seq(Term("%O'HARE%", negated = false))))
  }

  test("chain classifies known rows incl. shadowing and exclusions") {
    val rows = Seq(
      "BPS*BILT 123",             // branch 0
      "bps*bilt rewards x",       // ILIKE case-insensitivity; shadowed by branch 0
      "NATERA LAB WORK",          // Ova block
      "AMAZON PRIME*MONTHLY",     // Amazon Prime arm (no VIDEO)
      "ZZZ NOMATCH 42")           // ELSE
    val got = rows.toDF("description")
      .select(col("description"),
        MerchantCase.chainColumn(col("description")).as("m"))
      .as[(String, String)].collect().toMap
    assert(got("BPS*BILT 123") == "Bilt")
    assert(got("bps*bilt rewards x") == "Bilt")
    assert(got("NATERA LAB WORK") == "Ova")
    assert(got("AMAZON PRIME*MONTHLY") == "Amazon Prime")
    assert(got("ZZZ NOMATCH 42") == "Uncategorized")
  }

  test("negated term excludes: Amazon Prime VIDEO rows skip the Prime arm") {
    val m = Seq("AMAZON PRIME*VIDEO SUB").toDF("description")
      .select(MerchantCase.chainColumn(col("description")))
      .as[String].head()
    assert(m != "Amazon Prime") // the `and not ilike '%VIDEO%'` exclusion
  }

  test("likeToRegex mirrors Spark LIKE; requiredLiteral picks longest run") {
    import graft.operators.IlikeChain
    assert(IlikeChain.likeToRegex("%bps*bilt%") == "(?s).*\\Qbps*bilt\\E.*")
    assert("zettlex*angel orient limi rest".matches(
      IlikeChain.likeToRegex("zettle_*angel orient limi%"))) // '_' = any char
    assert(!"prime video".matches(IlikeChain.likeToRegex("prime video %")))
    assert(IlikeChain.requiredLiteral("%amazon prime*%") == "amazon prime*")
    assert(IlikeChain.requiredLiteral("zettle_*send coffee%") == "*send coffee")
    assert(IlikeChain.requiredLiteral("%_%") == "")
  }

  test("compiled single-node chain agrees with the declarative CaseWhen") {
    val rnd = new scala.util.Random(5)
    val probes = MerchantCase.branches.map(MerchantCase.probeFor)
    val mangled = probes.flatMap { p =>
      Seq(p, p.toUpperCase, "XX " + p, p + " TAIL",
        p.take(math.max(1, p.length - 2)),
        rnd.shuffle(p.toList).mkString)
    } ++ Seq("", "ZZZ", "AMAZON PRIME*VIDEO SUB", null)
    val df = mangled.toDF("description")
    val both = df.select(
      MerchantCase.chainExpr(col("description")).as("a"),
      MerchantCase.chainColumn(col("description")).as("b"))
    val diff = both.filter(!(col("a") <=> col("b"))).count()
    assert(diff == 0, s"$diff rows diverge between compiled and declarative")
  }

  test("probe fixture SQL parses in Spark and covers every branch merchant") {
    spark.range(1, 3000).toDF("o_orderkey")
      .withColumn("o_orderdate", to_date(lit("2024-01-01")))
      .withColumn("o_totalprice", lit(100.0) + col("o_orderkey") % 50)
      .createOrReplaceTempView("orders_mc_spec")
    val tx = spark.sql(MerchantCase.legacyTxSql("orders_mc_spec", sparkDialect = true))
    val named = tx.select(
      MerchantCase.chainColumn(col("description")).as("m"))
    val found = named.distinct().as[String].collect().toSet
    // all but a handful of shadowed/filter-trimmed merchants appear
    val all = MerchantCase.branches.map(_.merchant).toSet
    assert(found.contains("Uncategorized"))
    assert((all -- found).size < all.size / 10,
      s"too many unreached merchants: ${(all -- found).take(20)}")
  }
}
