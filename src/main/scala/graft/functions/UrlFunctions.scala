package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale corpus pipelines — the host-level side of
  * C4/RefinedWeb-style curation (Raffel et al. JMLR 2020 §2.2 filters
  * by source; Penedo et al. 2023 §3.1 dedups and filters by URL before
  * touching any text): canonicalize URLs into stable dedup keys,
  * extract (registrable) domains, gate against a domain blocklist, and
  * cap per-domain document counts so no single host dominates a crawl
  * snapshot.
  *
  * Everything scalar here is a pure codegen'd expression in the
  * Java∩RE2 regex subset (the [[TextFunctions.PiiPatterns]] convention)
  * so an external engine replays the normalization byte-for-byte — no
  * UDFs, no network, no real PSL lookup (see [[registrableDomain]] for
  * the documented heuristic). Null-strict: null URL → null out.
  */
object UrlFunctions {
  import TextFunctions.bound

  /** Query parameters stripped by [[normalizeUrl]]: click/campaign
    * trackers that vary per visit without changing the resource — the
    * reason two crawls of one page get different URLs.
    */
  val TrackingParamPattern: String =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid|ref|ref_src|mc_cid|mc_eid)="

  /** Multi-part public suffixes recognized by [[registrableDomain]]'s
    * heuristic. The real Public Suffix List is a data file thousands of
    * entries long; this is the high-traffic subset, and the function
    * documents the fallback (last two labels) for everything else.
    */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "com.tr", "com.ar", "co.in", "co.za", "co.kr", "com.sg", "com.hk")

  /** Canonical URL for dedup keys and host accounting. Contract (each
    * step a pure regex/HOF rewrite, engine-replayable):
    *
    *  1. trim; drop the `#fragment`
    *  2. scheme and host lowercase; path/query case preserved
    *  3. `www.` prefix dropped from the host
    *  4. default ports dropped (`:80` for http, `:443` for https)
    *  5. tracking query params removed ([[TrackingParamPattern]]);
    *     empty params collapse; a now-empty query drops its `?`
    *  6. trailing `/`s dropped from the path (root included)
    *
    * Strings without a `scheme://` are NOT URLs to this contract: they
    * pass through with only trim + fragment strip, visibly unchanged
    * otherwise (no guessing).
    */
  def normalizeUrl(u: Column): Column =
    bound(regexp_replace(trim(u), "#.*$", "")) { t =>
      bound(lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))) { scheme =>
        when(scheme === "", t).otherwise {
          bound(regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")) { after =>
            bound(hostFromAfter(scheme, after)) { host =>
              bound(regexp_replace(regexp_extract(after, "^[^/?]*([^?]*)", 1),
                  "/+$", "")) { path =>
                bound(array_join(filter(
                    split(regexp_extract(after, "\\?(.*)$", 1), "&"),
                    p => length(p) > 0 && !p.rlike(TrackingParamPattern)),
                  "&")) { q =>
                  concat(scheme, lit("://"), host, path,
                    when(q === "", lit("")).otherwise(concat(lit("?"), q)))
                }
              }
            }
          }
        }
      }
    }

  /** Lowercased host of a URL with `www.` and the scheme's default port
    * stripped — the per-host accounting key. Empty string for
    * non-URL-shaped input (no `scheme://`), null for null.
    */
  def urlHost(u: Column): Column =
    bound(trim(u)) { t =>
      bound(lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))) { scheme =>
        when(scheme === "", lit(""))
          .otherwise(hostFromAfter(scheme,
            regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")))
      }
    }

  private def hostFromAfter(scheme: Column, after: Column): Column =
    bound(regexp_replace(lower(regexp_extract(after, "^([^/?]+)", 1)),
        "^www\\.", "")) { h =>
      when(scheme === "http", regexp_replace(h, ":80$", ""))
        .when(scheme === "https", regexp_replace(h, ":443$", ""))
        .otherwise(h)
    }

  /** Registrable domain of a HOST (not a URL — compose with
    * [[urlHost]]): the label owners actually register, the right
    * granularity for caps and blocklists (`news.bbc.co.uk` and
    * `www.bbc.co.uk` are one publisher). Heuristic: last two labels,
    * or last three when the last two form a known multi-part suffix
    * ([[MultiPartTlds]]) — NOT the full Public Suffix List, which is an
    * external data file; swap the seq for the real list at deploy time.
    * Hosts with <2 labels (localhost, IPs are out of scope) pass
    * through unchanged.
    */
  def registrableDomain(host: Column): Column =
    bound(split(host, "\\.")) { ls =>
      bound(size(ls)) { n =>
        // greatest() keeps slice's start positive even on the 1-label
        // hosts the branches below never take — [[bound]] evaluates its
        // value eagerly, so an unguarded n-1 would throw before when()
        // could skip it
        bound(concat_ws(".", slice(ls, greatest(n - 1, lit(1)), lit(2)))) { last2 =>
          when(n >= 3 && array_contains(typedLit(MultiPartTlds), last2),
            concat_ws(".", slice(ls, greatest(n - 2, lit(1)), lit(3))))
            .when(n >= 2, last2)
            .otherwise(host)
        }
      }
    }

  /** Drop every row whose URL's registrable domain is on the blocklist.
    * The list rides as a literal array into codegen (blocklists are
    * config-sized); for a DataFrame-shaped list join
    * `broadcast(blocked)` with `left_anti` instead. Rows with a NULL
    * URL are KEPT — they have no domain to match, and a blocklist must
    * never silently erase the no-URL slice of a corpus (the visible-
    * null convention; drop them explicitly upstream if unwanted).
    */
  def domainBlocklistFilter(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist — nothing to filter")
    df.filter(coalesce(
      !array_contains(typedLit(blockedDomains.map(_.toLowerCase)),
        registrableDomain(urlHost(col(urlCol)))),
      lit(true)))
  }

  /** Keep at most `cap` documents per registrable domain, smallest
    * `orderCol` first — the "no host dominates the corpus" rule.
    * Delegates to [[SamplingFunctions.capPerGroup]]'s bounded
    * [[KthSmallest]] heap (map-side partials, broadcast cuts): no
    * row_number window, no per-domain serialization, hot domains cost
    * O(cap) state. Ties across the cut keep both (the capPerGroup
    * contract) — pass a unique orderCol (doc id) for exact caps.
    */
  def capPerDomain(df: DataFrame, urlCol: String, orderCol: String,
      cap: Int): DataFrame = {
    val taken = df.columns.toSet
    val dom = graft.ops.ColNames.fresh(taken, "_domain")
    SamplingFunctions.capPerGroup(
      df.withColumn(dom, registrableDomain(urlHost(col(urlCol)))),
      dom, orderCol, cap).drop(dom)
  }
}
