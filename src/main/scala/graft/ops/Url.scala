package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization (EXT X4 — crawl-pipeline hygiene): the
  * dedup-safe normalization set applied before any URL-keyed dedup or
  * frequency census — without it the same page counts once per tracking
  * tag and once per scheme-case variant, which both inflates counts and
  * defeats exact dedup. Everything here is pure `Column` expressions
  * (codegen-friendly, no UDF), and the gate's oracle replays the
  * GENERATOR, not the implementation — the expected canonical form is a
  * closed-form function of the fixture id, so the truth is independent
  * of this code.
  *
  * Normalizations applied (the safe, semantics-preserving set):
  *   - scheme and host lowercased
  *   - default ports dropped (http:80, https:443); explicit non-default
  *     ports kept
  *   - duplicate path slashes collapsed; empty path → "/"
  *   - fragment dropped (never sent to the server)
  *   - tracking query parameters dropped (utm_*, fbclid, gclid,
  *     msclkid, igshid, mc_eid — the documented set)
  *   - remaining query parameters sorted bytewise (param order is
  *     almost never semantic; sorting makes equal queries equal
  *     strings); empty query dropped
  * NOT applied (documented boundaries, they can change semantics or
  * need a stack): dot-segment resolution, percent-encoding
  * normalization, IDN/punycode, IPv6 host forms. A URL without a
  * scheme yields NULL — intake should count those, not guess. */
object Url {

  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_eid)="

  def canonicalizeUrl(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val path = regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(nofrag, "\\?([^#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val cleanPath = when(path === "", lit("/"))
      .otherwise(regexp_replace(path, "/{2,}", "/"))
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val cleanQuery = concat_ws("&", array_sort(params))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        cleanPath,
        when(cleanQuery =!= "", concat(lit("?"), cleanQuery))
          .otherwise(lit(""))))
  }
}
