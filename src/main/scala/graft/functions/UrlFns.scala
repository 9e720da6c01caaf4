package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key every web-crawl pipeline
  * computes before content-level dedup (CCNet / RefinedWeb dedupe by
  * normalized URL first; reference behavior: crawl curation operates
  * on canonical URLs). Pure Column expressions (regexp_extract /
  * regexp_replace / rtrim / array ops — all codegen or interpreted-HOF
  * over short strings, no UDF), with every rule chosen to be
  * replayable verbatim in ANSI-ish SQL so the oracle can pin it:
  *
  *   - scheme and host lowercase; a leading `www.` is dropped
  *   - default ports vanish (`:80` for http, `:443` for https);
  *     explicit non-default ports survive
  *   - the path loses trailing slashes (the root path stays `/`;
  *     an absent path becomes `/`)
  *   - query parameters are SORTED (param order is not semantic),
  *     tracking params (`utm_*`) and empty segments are dropped; an
  *     emptied query drops its `?`
  *   - fragments never reach the canonical form (the extraction
  *     regexes stop at `#`)
  *
  * All regexes are RE2-safe and anchored, so Spark's replace-all and
  * DuckDB's replace-first agree by construction.
  */
object UrlFns {

  def urlScheme(u: Column): Column =
    regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)

  def urlHostPort(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  def urlQuery(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** The canonical host alone (no port) — the host-level grouping key
    * (per-host quotas, robots policy, domain-level quality priors).
    */
  def canonicalHost(u: Column): Column = {
    val hp = regexp_replace(lower(urlHostPort(u)), "^www\\.", "")
    regexp_replace(hp, ":[0-9]+$", "")
  }

  def canonicalUrl(u: Column): Column = {
    val scheme = lower(urlScheme(u))
    val hp0 = regexp_replace(lower(urlHostPort(u)), "^www\\.", "")
    val hp = when(scheme === "http", regexp_replace(hp0, ":80$", ""))
      .when(scheme === "https", regexp_replace(hp0, ":443$", ""))
      .otherwise(hp0)
    val p0 = rtrim(urlPath(u), "/")
    val path = when(p0 === "", lit("/")).otherwise(p0)
    val segs = filter(split(urlQuery(u), "&"),
      x => x =!= "" && !startswith(x, lit("utm_")))
    val q = array_join(array_sort(segs), "&")
    concat(scheme, lit("://"), hp, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }
}
