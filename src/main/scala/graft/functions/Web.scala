package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the key-maker for
  * URL-level dedup (the first dedup pass of every web-scale pipeline:
  * the same page crawled twice differs only in tracking params, case,
  * default ports, fragments).
  *
  * All pure Catalyst regexp/array expressions — map-only, codegen'd,
  * no UDF — so canonicalization rides the scan at 100 TB and the
  * canonical URL is immediately usable as an exact-dedup groupBy key.
  */
object Web {

  private val TrackingParam = "^(utm_[a-z]+|fbclid|gclid|msclkid)="

  private def noFragment(url: Column): Column =
    regexp_replace(trim(url), "#.*$", "")

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://.*$", 1))

  private def hostPortOf(u: Column): Column =
    lower(regexp_extract(u, "^[^:]+://([^/?#]+).*$", 1))

  /** Canonical form: lowercase scheme+host, default port stripped
    * (http:80, https:443), duplicate slashes collapsed, trailing
    * slash dropped (root path kept as "/"), fragment dropped,
    * tracking params (utm_*, fbclid, gclid, msclkid) removed, and the
    * surviving query params sorted — so byte-equality of the output
    * is URL identity.
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = noFragment(url)
    val scheme = schemeOf(u)
    val hostPort = hostPortOf(u)
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_replace(
      regexp_extract(u, "^[^:]+://[^/?#]+([^?#]*).*$", 1), "/{2,}", "/")
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val params = filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => length(p) > 0 && !p.rlike(TrackingParam))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Host with port and leading "www." stripped — the per-site
    * aggregation key (quality stats per domain, domain blocklists).
    * True eTLD+1 extraction needs the public-suffix list; host-less-www
    * is the standard cheap approximation.
    */
  def domainOf(url: Column): Column =
    regexp_replace(
      regexp_replace(hostPortOf(noFragment(url)), ":[0-9]+$", ""),
      "^www\\.", "")
}
