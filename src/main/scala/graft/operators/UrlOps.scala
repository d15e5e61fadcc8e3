package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the crawl-curation surface:
  * web-scale corpora (C4, RefinedWeb) deduplicate BY URL before any content
  * pass, cap documents per registered domain, and aggregate quality stats
  * per site. All of that needs one canonical key per page and one
  * registered-domain key per host.
  *
  * Everything here is a codegen'd Column expression chain (regex + array
  * ops, no UDF) producing STRINGS — bit-exact cross-engine by construction
  * (no floating point anywhere). Patterns stay in the Java-regex/RE2 common
  * subset (the stripMarkup rule).
  *
  * Scope (documented, not silently wrong): userinfo (`user:pw@host`) and
  * dot-segment paths (`/a/../b`) are not normalized — crawl frontiers
  * emit neither in practice; percent-encoding is preserved as-is.
  */
object UrlOps {

  private def lowerScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def authority(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Host without port, lowercased, leading `www.` stripped. */
  def host(u: Column): Column =
    regexp_replace(regexp_replace(authority(u), ":[0-9]+$", ""), "^www\\.", "")

  /** Canonical URL:
    *   - scheme + host lowercased, `www.` stripped
    *   - fragment removed
    *   - default ports dropped (http:80, https:443); explicit others kept
    *   - tracking params removed (`utm_*`, `fbclid`, `gclid`), remaining
    *     query order PRESERVED (param sorting changes real-world keys for
    *     order-sensitive endpoints; dropping junk params does not)
    *   - trailing path slash dropped (root stays `/`), empty path -> `/`
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lowerScheme(noFrag)
    val auth = authority(noFrag)
    val h = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val rawPath = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    val qs = regexp_extract(rest, "\\?(.*)$", 1)
    val cleanQs = array_join(
      filter(split(qs, "&"), p =>
        !p.rlike("^(utm_[^=]*|fbclid|gclid)=") && p =!= lit("")), "&")
    concat(scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(cleanQs =!= "", concat(lit("?"), cleanQs)).otherwise(lit("")))
  }

  /** Multi-label public suffixes checked before the single-label ones. */
  val Suffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "com.au", "co.jp", "com.br",
    "com", "org", "net", "io", "gov", "edu", "info", "biz")

  /** Registered domain of a (canonical) host: the label immediately left of
    * the LONGEST matching public suffix, plus the suffix — `a.b.site.co.uk`
    * -> `site.co.uk`. Hosts under no known suffix return unchanged (the
    * conservative choice: never merge what we cannot classify).
    */
  def registeredDomain(h: Column): Column =
    Suffixes.foldLeft(when(lit(false), lit(""))) { case (acc, s) =>
      val esc = s.replace(".", "\\.")
      acc.when(h.rlike(s"(^|\\.)[^.]+\\.$esc$$"),
        regexp_extract(h, s"([^.]+\\.$esc)$$", 1))
    }.otherwise(h)
}
