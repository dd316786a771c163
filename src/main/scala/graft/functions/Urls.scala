package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalizer that makes `content_url` a
  * reliable identity key for the crawl dedup chain (Bloom probe + exact
  * sink, redis_utils.py / mongodb_utils.py key semantics): without it,
  * case, fragments, tracking parameters, and default ports make the
  * same page look like distinct keys.
  *
  * Rules (each a pure column expression — codegen'd, scan-parallel):
  *  - trim; strip the `#fragment`
  *  - lowercase scheme and host (path/query case is significant)
  *  - drop the default port (`:80` for http, `:443` for https)
  *  - drop tracking parameters: names starting `utm_`, plus
  *    fbclid/gclid/ref
  *  - sort surviving query parameters (order-insensitive canonical
  *    form); drop the `?` when none survive
  */
object Urls {

  private val trackingNames = Seq("fbclid", "gclid", "ref")

  def canonicalize(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[^:/?#]+://", "")
    val hostPort = lower(regexp_extract(afterScheme, "^([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(afterScheme, "^[^/?#]*", "")
    val path = regexp_extract(pathQ, "^([^?#]*)", 1)
    val query = regexp_extract(pathQ, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(query, "&"), p => {
      val name = get(split(p, "="), lit(0))
      p =!= "" && !name.startsWith("utm_") &&
        !name.isin(trackingNames.map(lit(_)): _*)
    }))
    val queryOut = array_join(kept, "&")
    when(scheme === "", t) // not a scheme://host url — leave untouched
      .otherwise(concat(scheme, lit("://"), host, path,
        when(queryOut === "", "").otherwise(concat(lit("?"), queryOut))))
  }

  /** Lowercased host of a `scheme://host...` url, any port stripped. */
  def host(u: Column): Column = {
    val afterScheme = regexp_replace(u, "^[^:/?#]+://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?#]*)", 1)
    lower(regexp_replace(hostPort, ":\\d+$", ""))
  }

  /** Two-part public suffixes under which the registered domain is
    * three labels, not two (`bbc.co.uk` → `bbc.co.uk`, never `co.uk`).
    * A compact subset of the Public Suffix List covering the common
    * ccTLD second-level registries; extend for full PSL fidelity. */
  private val twoPartSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "co.in", "co.kr", "co.nz", "co.za", "co.il", "co.id", "co.th",
    "com.br", "com.cn", "com.tr", "com.mx", "com.ar", "com.sg",
    "com.hk", "com.tw", "com.my", "com.ph", "com.vn", "com.pk")

  /** Registered domain of a host: the last two dot-labels, or the last
    * THREE when the final two are a known two-part public suffix
    * (`co.uk`, `com.au`, … — see [[twoPartSuffixes]]; hosts under
    * suffixes outside that list fall back to last-two and may merge
    * unrelated sites). Single-label hosts (e.g. `localhost`) pass
    * through unchanged. The grouping key for per-domain corpus
    * statistics. */
  def registeredDomain(h: Column): Column = {
    val suffixAlt = twoPartSuffixes.map(_.replace(".", "\\.")).mkString("|")
    val three = regexp_extract(h, s"([^.]+\\.(?:$suffixAlt))$$", 1)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).when(two =!= "", two).otherwise(h)
  }
}
