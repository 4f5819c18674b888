package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL/domain-level corpus curation.
  *
  * The reference observes the problem directly: the watcher follows
  * redirects and records `resp.url` as the document's final address
  * (`fda_rag_extraction/scripts/fda_watcher.py:151-152`), and resolves
  * relative hrefs with `urljoin` (`fda_watcher.py:323`) — so the same
  * document is reachable under several raw spellings (mixed-case host,
  * default port, tracking params, fragment). At web-corpus scale
  * (C4 / CCNet / RefinedWeb style pipelines) the standard first-pass
  * curation steps are exactly the ones here:
  *
  *   1. [[canonicalize]] — normalize every raw URL to one spelling, so
  *      URL-exact dedup catches re-crawls of the same page;
  *   2. URL-exact dedup — hash-groupBy on the canonical form (one
  *      shuffle keyed on the canonical URL, same shape as
  *      [[Fingerprint.dedupByFingerprint]]);
  *   3. [[domainOf]] + per-domain caps / blocklists — anti-spam: no
  *      single host may dominate the corpus, and known-bad domains are
  *      excluded before any expensive text processing.
  *
  * Everything is built from codegen'd string builtins (`regexp_*`,
  * `split`, `array_sort`) — no UDFs, no per-row allocation beyond what
  * the expressions themselves do — so the whole family stays inside
  * whole-stage codegen and is trivially SQL-replayable by the oracle.
  *
  * Scale shape: canonicalization and domain extraction are narrow maps
  * (no shuffle); the dedup and cap passes each key ONE shuffle on a
  * high-cardinality column (canonical URL / domain), so they partition
  * evenly at 100 TB. A hot domain in the cap pass is bounded by the
  * window's top-`cap` pruning (WindowGroupLimit pushes the limit below
  * the sort at the partial level).
  */
object UrlOps {

  /** Query parameters dropped during canonicalization (as NAME
    * PATTERNS, matched case-insensitively — trackers arrive in any
    * casing: `UTM_SOURCE=`, `Fbclid=`): click-tracking decorations that
    * never change the addressed content. Bare `ref` is deliberately NOT
    * here — on some hosts `?ref=<branch>` IS content addressing (code
    * forges), so dropping it would collapse genuinely distinct pages;
    * callers curating a corpus where `ref` is known to be a tracker
    * pass an extended list to [[canonicalize]]. */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_[A-Za-z0-9_]*", "gclid", "fbclid", "msclkid",
      "mc_cid", "mc_eid", "ref_src")

  private def trackingParamRe(dropParams: Seq[String]): String =
    dropParams.mkString("(?i)^(", "|", ")=")

  private def schemeOf(noFrag: Column): Column =
    lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPortOf(noFrag: Column): Column =
    lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))

  /** Canonical spelling of an absolute http(s) URL:
    *
    *   - fragment dropped (`#...` is client-side only);
    *   - scheme and host lowercased (RFC 3986 §6.2.2.1);
    *   - default port stripped (`:80` for http, `:443` for https);
    *   - duplicate slashes in the path collapsed, empty path → `/`;
    *   - query parameters: empties and tracking params
    *     ([[DefaultTrackingParams]], matched case-insensitively;
    *     override via `dropParams`) removed, the rest sorted bytewise
    *     so parameter order never distinguishes two spellings of one
    *     address.
    *
    * Idempotent: `canonicalize(canonicalize(u)) == canonicalize(u)`
    * (pinned in UrlOpsSpec). Non-URL inputs (no `scheme://`) map to an
    * empty-host form and are the caller's job to quarantine.
    */
  def canonicalize(url: Column,
      dropParams: Seq[String] = DefaultTrackingParams): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = schemeOf(noFrag)
    val hostPort = hostPortOf(noFrag)
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "//+", "/"))
    val rawQuery = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParamRe(dropParams)))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Registrable-host grouping key: the canonical host with a leading
    * `www.` stripped (the one alias virtually every site serves) and
    * any port removed. Proper public-suffix-list parsing needs the PSL
    * table — out of scope offline; `www.`-stripping covers the dominant
    * alias class and keeps the key a pure string function. */
  def domainOf(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    regexp_replace(regexp_replace(hostPortOf(noFrag), ":[0-9]+$", ""), "^www\\.", "")
  }

  /** URL-exact dedup: one survivor per canonical URL (smallest id — the
    * earliest crawl), with the duplicate count as the re-crawl signal.
    * One shuffle, keyed on the canonical URL. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("__canon", canonicalize(col(urlCol)))
      .groupBy(col("__canon").as("canonical_url"))
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).cast("long").as("n_dups"))

  /** Domain-level curation: drop blocklisted domains, then keep at most
    * `cap` documents per domain under a deterministic preference order
    * (`orderCols`). `blocklist` must carry its domains in a column
    * named `blocked_domain` (enforced). The blocklist is a small
    * table → broadcast anti-join; the cap is one window keyed on the
    * domain whose
    * `row_number <= cap` filter prunes at the partial level
    * (WindowGroupLimit), so a spam domain with 10^9 pages never
    * materializes more than its top `cap` per partition. */
  def domainCapFilter(df: DataFrame, urlCol: String, blocklist: DataFrame,
      cap: Int, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blocklist.columns.contains("blocked_domain"),
      "blocklist must have a 'blocked_domain' column")
    val withDom = df.withColumn("domain", domainOf(col(urlCol)))
    val kept = withDom.join(broadcast(blocklist),
      withDom("domain") === blocklist("blocked_domain"), "left_anti")
    val w = Window.partitionBy("domain").orderBy(orderCols: _*)
    kept.withColumn("domain_rank", row_number().over(w).cast("int"))
      .filter(col("domain_rank") <= cap)
  }
}
