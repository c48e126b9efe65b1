"""Web-corpus hygiene: URL normalization, domain blocklist filtering.

Crawl-derived training corpora key almost everything on URLs: dedup by
normalized URL, drop blocked domains (spam/adult/malware lists run to
millions of entries), keep allowed schemes.  These are string-expression
operators — pure codegen, no UDFs — with the blocklist join shaped so
the list can be arbitrarily large (semi-join on exploded host suffixes,
never a LIKE scan).

Beyond-reference module (the reference has no web operators); part of
the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters every crawl pipeline strips (Google/Facebook/
# Microsoft click ids + utm_* campaign tags).
_TRACKING = "(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)"


def normalize_url(url_col: str) -> Column:
    """Canonical URL form: lowercase scheme+host, strip the fragment,
    strip tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
    …), drop an emptied ``?``, drop a trailing slash on non-root paths.

    Pure regex/string expressions (identical RE2-safe patterns run on
    any engine — no lookaheads), so two crawls of the same page with
    different campaign tags normalize to one key for exact dedup."""
    c = f"CAST({url_col} AS STRING)"
    # 1. drop fragment
    e = f"regexp_replace({c}, '#.*$', '')"
    # 2. drop tracking params (leading ? or & kept group-wise, then tidy)
    e = f"regexp_replace({e}, '([?&]){_TRACKING}=[^&#]*', '$1')"
    # 3. collapse '?&' / '&&' runs left behind, drop trailing '?' or '&'
    e = f"regexp_replace({e}, '\\\\?&', '?')"
    e = f"regexp_replace({e}, '&&+', '&')"
    e = f"regexp_replace({e}, '[?&]$', '')"
    # 4. lowercase scheme://host (leave path/query case alone)
    e = (f"concat(lower(regexp_extract({e}, '^([^/]*//[^/?#]*)', 1)), "
         f"regexp_replace({e}, '^[^/]*//[^/?#]*', ''))")
    # 5. trailing slash on a non-root path
    e = f"regexp_replace({e}, '(//[^/]+/.+)/$', '$1')"
    return F.expr(e)


def url_host(url_col: str) -> Column:
    """Lowercased host (no port, no credentials) via one regex."""
    return F.expr(
        f"lower(regexp_extract(CAST({url_col} AS STRING), "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1))"
    )


def filter_urls(
    df: DataFrame,
    url_col: str,
    block_domains: DataFrame | list[str] | None = None,
    allow_schemes: tuple[str, ...] = ("http", "https"),
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Keep rows whose URL has an allowed scheme and whose host is not
    under any blocked domain (exact host OR any parent domain:
    ``ads.tracker.example.com`` is blocked by ``tracker.example.com``
    and by ``example.com``).

    Scale shape: the DISTINCT hosts (cardinality ≪ rows — a crawl has
    billions of pages over millions of hosts) explode to their last
    ``max_suffix_labels`` label-suffixes (bounded fan-out) and
    semi-join the blocklist on EQUALITY — a million-domain blocklist is
    just a join side (broadcast when small, shuffle when not), never a
    per-row ``LIKE`` scan over the list; rows then anti-join the small
    blocked-host set on the host key.  Bag semantics are preserved
    (duplicate rows survive together).  Scheme check is a pure
    scan-stage filter."""
    scheme = F.expr(
        f"lower(regexp_extract(CAST({url_col} AS STRING), "
        f"'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    )
    out = df.filter(scheme.isin(*[s.lower() for s in allow_schemes]))
    if block_domains is None:
        return out
    spark = df.sparkSession
    if isinstance(block_domains, list):
        # config-sized literal list — always broadcast (a local relation
        # reaches the suffix join as SMJ otherwise)
        bl = F.broadcast(spark.createDataFrame(
            [(d.lower().strip("."),) for d in block_domains], "__bd string"
        ))
    else:
        cols = block_domains.columns
        bl = block_domains.select(
            F.lower(F.col(cols[0])).alias("__bd")
        )
    host = url_host(url_col)
    # suffixes: for labels [a,b,c,d] emit d, c.d, b.c.d, a.b.c.d (capped)
    suffixes = (
        f"transform(sequence(1, least(size(split(__host, '\\\\.')), "
        f"{int(max_suffix_labels)})), "
        f"n -> array_join(slice(split(__host, '\\\\.'), "
        f"size(split(__host, '\\\\.')) - n + 1, n), '.'))"
    )
    blocked_hosts = (
        out.select(host.alias("__host")).distinct()
        .withColumn("__sfx", F.explode(F.expr(suffixes)))
        .join(bl, F.col("__sfx") == F.col("__bd"), "left_semi")
        .select("__host").distinct()
    )
    return (
        out.withColumn("__host", host)
        .join(blocked_hosts, "__host", "left_anti")
        .drop("__host")
    )
