package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl training pipelines (the
  * RefinedWeb/C4 preprocessing family): crawls record the same page under
  * `http://`/`https://`, with and without `www.`, with tracking params in
  * any order, fragments, and trailing slashes — URL-level dedup and
  * per-domain caps are wrong until those collapse to one canonical form.
  *
  * Everything is builtin regex/array column algebra — scan-fused,
  * codegen'd, zero shuffles — and portable operation-for-operation to the
  * DuckDB oracle (q_url_normalize).
  */
object Urls {

  /** Query params dropped during canonicalization: tracking/attribution
    * noise that fans one page out into thousands of "distinct" URLs.
    */
  val trackingParamPattern = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

  /** scheme + userinfo + `www.` stripped, fragment dropped. The userinfo
    * strip (`user:pw@host` → `host`) keeps URL dedup and per-domain caps
    * from treating `http://user@example.com/x` and `http://example.com/x`
    * as different pages; `[^/?#]*` confines the match to the authority
    * component so an `@` in path/query/fragment is untouched.
    */
  private def stripShell(url: Column): Column = {
    val s1 = regexp_replace(url, "^[Hh][Tt][Tt][Pp][Ss]?://", "")
    val s2 = regexp_replace(s1, "^[^/?#]*@", "")
    val s3 = regexp_replace(s2, "^[Ww][Ww][Ww]\\.", "")
    regexp_replace(s3, "#.*$", "")
  }

  /** Lowercased registrable host (no scheme/www/port). */
  def domainOf(url: Column): Column =
    lower(regexp_replace(regexp_extract(stripShell(url), "^([^/?]+)", 1), ":[0-9]+$", ""))

  /** Canonical URL: lowercased host (case-insensitive per RFC 3986),
    * original-case path with trailing slashes trimmed, tracking params
    * removed, surviving params sorted, fragment dropped, scheme and
    * `www.` stripped. Pure row-local column algebra.
    */
  def normalize(url: Column): Column = {
    val s = stripShell(url)
    val host = domainOf(url)
    val rest = regexp_extract(s, "^[^/?]+(.*)$", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = when(query === "", array().cast("array<string>"))
      .otherwise(filter(split(query, "&"),
        p => !(p.rlike(trackingParamPattern) || p === "")))
    val sortedQ = array_join(array_sort(params), "&")
    concat(host, path, when(sortedQ === "", "").otherwise(concat(lit("?"), sortedQ)))
  }

  /** URL-level dedup verdict over a crawl frame: one shuffle on the
    * canonical form (the [[Dedup.exact]] shape, keyed on [[normalize]]
    * instead of content hash). Returns (url_norm, keep_id, n_copies).
    */
  def dedupByUrl(df: org.apache.spark.sql.DataFrame, idCol: String, urlCol: String)
      : org.apache.spark.sql.DataFrame =
    df.groupBy(normalize(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** STREAMING URL-level dedup — the crawl-frontier face of [[dedupByUrl]]:
    * every micro-batch keeps only rows whose CANONICAL URL was never
    * accepted before, against the ledger of all previously accepted URLs
    * (idempotent crash replay, batch-scoped overwrite — the
    * [[Dedup.bloomIncrementalStream]] ledger recipe, with the canonical
    * URL string as the content key). This is how a continuously-running
    * crawler avoids refetching `http://`/`www.`/`?utm_…` variants of
    * pages it already holds; state is the ~48-byte-per-URL ledger, the
    * accepted history is never re-shuffled.
    */
  def dedupByUrlStream(stream: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String, ledgerDir: String, outDir: String, checkpointDir: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.Dedup.bloomIncrementalStream(
      stream.withColumn("url_norm", normalize(col(urlCol))),
      idCol, "url_norm", ledgerDir, outDir, checkpointDir, expectedItems, fpp)
}
