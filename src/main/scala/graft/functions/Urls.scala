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

  /** Registered domain = the last two dot-labels of a host (the
    * grouping key for per-domain corpus statistics). Single-label
    * hosts (e.g. `localhost`) pass through unchanged. */
  def registeredDomain(h: Column): Column = {
    val d = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(d === "", h).otherwise(d)
  }
}
