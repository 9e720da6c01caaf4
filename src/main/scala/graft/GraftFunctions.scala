package graft

import graft.dialect.RegexpReplaceFirst
import graft.functions.{DotProduct, MinHashSig, SimHashSig}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the engine's custom expressions, so `spark.sql`
  * users get the dialect too:
  *
  *   regexp_replace_first(s, pattern, replacement)
  *   graft_dot(arrayA, arrayB)
  *   minhash_sig(shingleArray, numHashes)
  *   simhash_sig(tokenArray)
  *
  * Two paths: [[GraftFunctions.register]] on a live session, or
  * `spark.sql.extensions=graft.GraftExtensions` at session build time
  * (the SparkSessionExtensions route for deployments).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "regexp_replace_first" -> { es =>
      require(es.length == 3, "regexp_replace_first(s, pattern, replacement)")
      RegexpReplaceFirst(es(0), es(1), es(2))
    },
    "graft_dot" -> { es =>
      require(es.length == 2, "graft_dot(a, b)")
      DotProduct(es(0), es(1))
    },
    "minhash_sig" -> { es =>
      require(es.length == 2, "minhash_sig(shingles, numHashes)")
      MinHashSig(es(0), intLit(es(1), "numHashes"))
    },
    "simhash_sig" -> { es =>
      require(es.length == 1, "simhash_sig(tokens)")
      SimHashSig(es(0))
    },
    "bpe_token_count" -> { es =>
      require(es.length == 1, "bpe_token_count(text)")
      graft.functions.BpeTokenCountExpr(es(0))
    },
    "bpe_id_checksum" -> { es =>
      require(es.length == 1, "bpe_id_checksum(text)")
      graft.functions.BpeIdChecksumExpr(es(0))
    })

  /** The URL canonicalization kit (d47/d49) for SQL users — registered
    * as Spark 4 SQL-defined functions (CREATE TEMPORARY FUNCTION …
    * RETURN <expr>): the Column-composed [[graft.functions.UrlFns]]
    * trees carry lambda HOFs that a raw function-registry builder
    * cannot inject unresolved, so the SQL twin states the SAME rules in
    * SQL text; SqlSurfaceSpec pins SQL == Column on a
    * every-rule-triggering URL, so the twins cannot drift silently.
    */
  private val sqlFunctions: Seq[String] = {
    val hp0 = """regexp_replace(lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\\.', '')"""
    Seq(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION canonical_host(u STRING)
         |RETURNS STRING RETURN regexp_replace($hp0, ':[0-9]+$$', '')""".stripMargin,
      s"""CREATE OR REPLACE TEMPORARY FUNCTION canonical_url(u STRING)
         |RETURNS STRING RETURN concat(
         |  lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)), '://',
         |  CASE lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
         |    WHEN 'http' THEN regexp_replace($hp0, ':80$$', '')
         |    WHEN 'https' THEN regexp_replace($hp0, ':443$$', '')
         |    ELSE $hp0 END,
         |  CASE WHEN rtrim('/', regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)) = ''
         |    THEN '/'
         |    ELSE rtrim('/', regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)) END,
         |  CASE WHEN array_join(array_sort(filter(split(regexp_extract(u, '\\\\?([^#]*)', 1), '&'),
         |      x -> x != '' AND NOT startswith(x, 'utm_'))), '&') != ''
         |    THEN concat('?', array_join(array_sort(filter(split(regexp_extract(u, '\\\\?([^#]*)', 1), '&'),
         |      x -> x != '' AND NOT startswith(x, 'utm_'))), '&'))
         |    ELSE '' END)""".stripMargin)
  }

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
    sqlFunctions.foreach(spark.sql(_))
  }
}

/** Session-build-time registration:
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        b))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}
