package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL utilities for corpus curation: host extraction and URL
  * canonicalization as composed codegen'd expressions (regexp_extract
  * / filter / array_join — no UDFs), feeding per-domain quota caps
  * ([[graft.operators.Sampling.quotaCap]]) and per-source sampling.
  *
  * The canonicalization contract (deliberately regex-only, so a
  * DuckDB/RE2 oracle rederives it bit-for-bit — no lookarounds):
  *   - input without a `scheme://` prefix returns UNCHANGED (ids and
  *     non-URL sources pass through; [[urlHost]] returns NULL there);
  *   - scheme and host lowercase; userinfo (`user:pw@`) dropped;
  *   - default ports drop (`http:80`, `https:443`), others keep;
  *   - fragment (`#...`) dropped;
  *   - tracking parameters drop — `utm_*`, `gclid`, `fbclid`,
  *     `msclkid`, `mc_cid`, `mc_eid` — remaining params keep their
  *     original order and encoding (no percent-decoding, no sorting:
  *     decoding would conflate distinct resources);
  *   - empty path becomes `/`; an emptied query drops its `?`.
  */
object UrlFunctions {

  private val Scheme = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val Tracking =
    "^(utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=|$)"

  private def authority(url: Column): Column =
    regexp_extract(url, Scheme + "([^/?#]*)", 2)

  /** Lowercased registrable host of `url` (port and userinfo
    * stripped), or NULL for strings without `scheme://authority` —
    * the grouping key for per-domain quotas. */
  def urlHost(url: Column): Column = {
    val host = lower(regexp_extract(authority(url), "^(?:[^@]*@)?([^:]*)", 1))
    when(host === "", lit(null).cast("string")).otherwise(host)
  }

  /** Canonical form of `url` under the contract above. */
  def urlCanon(url: Column): Column = {
    val scheme = lower(regexp_extract(url, Scheme, 1))
    val auth = authority(url)
    val host = lower(regexp_extract(auth, "^(?:[^@]*@)?([^:]*)", 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val rest = regexp_extract(url, Scheme + "[^/?#]*([^#]*)", 2)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val cleaned = array_join(
      filter(split(query, "&"), p => !p.rlike(Tracking)), "&")
    val qPart =
      when(cleaned === "", lit("")).otherwise(concat(lit("?"), cleaned))
    val pathPart = when(path === "", lit("/")).otherwise(path)
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, qPart))
  }
}
