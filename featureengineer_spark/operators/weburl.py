"""URL canonicalization and URL-keyed curation for web-crawl corpora.

A 100 TB web crawl carries one URL per document, and the first
deduplication pass in every published pipeline (CCNet, RefinedWeb,
FineWeb) is URL-level: canonicalize, then keep one document per
canonical URL. The reference engine's analog is its per-key first-seen
discipline over show/channel identifiers (``IVector.py:1090-1104``
keyed segment selection); here the key is the canonicalized URL.

Everything in this module is built-in ``pyspark.sql.functions``
expressions — canonicalization is a pure map (free at 100 TB: no
shuffle, rides whole-stage codegen), and the dedup is one hash
aggregation on the canonical key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Query parameters that never change page content — the standard
#: tracking/attribution set stripped by every crawl canonicalizer.
TRACKING_PARAM_REGEX = (
    r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)="
)

#: URL splitter: scheme :// host[:port] path [?query] [#fragment].
#: Group 1 = scheme, 2 = host[:port], 3 = path, 4 = query (no '?').
URL_REGEX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

#: Minimal public-suffix overrides: second-level registries where the
#: registrable domain is the last THREE host labels, not two.
SECOND_LEVEL_SUFFIXES = ("co.uk", "com.au", "co.jp", "com.br", "co.in")


def canonical_url(col: F.Column) -> F.Column:
    """Canonical form of a URL expression.

    Deterministic, locale-free normalization: lowercase scheme+host,
    strip the fragment, strip default ports (``:80`` for http, ``:443``
    for https), drop trailing slashes from the path, remove tracking
    query parameters, and sort the surviving parameters. Malformed URLs
    (no ``scheme://``) pass through trimmed-lowercased so the dedup key
    is still stable.
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, URL_REGEX, 1))
    hostport = F.lower(F.regexp_extract(u, URL_REGEX, 2))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"\.$", "")
    path = F.regexp_replace(F.regexp_extract(u, URL_REGEX, 3), r"/+$", "")
    query = F.regexp_extract(u, URL_REGEX, 4)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qnorm) > 0, F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(canon)


def url_domain(col: F.Column) -> F.Column:
    """Registrable domain of a URL expression: the last two host labels,
    or three when the suffix is a known second-level registry
    (``co.uk``-style). IP hosts pass through whole."""
    hostport = F.lower(F.regexp_extract(F.trim(col), URL_REGEX, 2))
    host = F.regexp_replace(F.regexp_replace(hostport, r":\d+$", ""), r"\.$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    second_level = F.lit(False)
    for suf in SECOND_LEVEL_SUFFIXES:
        second_level = second_level | last2.eqNullSafe(F.lit(suf)) | host.endswith("." + suf)
    return (
        F.when(is_ip | (n <= 2), host)
        .when(second_level, last3)
        .otherwise(last2)
    )


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Attach ``canonical_url`` and ``domain`` columns (pure map —
    zero shuffle; verify with ``.explain()``: the whole thing is one
    Project inside the scan's codegen stage)."""
    u = F.col(url_col)
    return df.withColumn(out_col, canonical_url(u)).withColumn(
        "domain", url_domain(u)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Keep exactly one row per canonical URL — the first by
    ``(order_col, id_col)`` (or by ``id_col`` alone), the crawl-dedup
    keep-earliest discipline.

    One shuffle on the canonical key; the canonical-URL key space is
    nearly unique (dup groups are tiny), so the per-key window sort is
    O(group) and AQE coalesces the post-shuffle partitions. At 100 TB
    this is the cheapest of the dedup family — no shingles, no
    signatures, just a hash partition on a string key.
    """
    work = df.withColumn("__canon", canonical_url(F.col(url_col)))
    order = [F.col(order_col).asc_nulls_last(), F.col(id_col)] if order_col else [
        F.col(id_col)
    ]
    w = Window.partitionBy("__canon").orderBy(*order)
    return (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__canon")
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registrable domain is on the blocklist.

    The blocklist is a dimension (thousands-to-millions of rows vs
    billions of documents) — it rides a broadcast anti-join, so the
    corpus is never shuffled. Pass either a one-column DataFrame
    (``domain``) or a plain list.
    """
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked], "domain string"
        )
    work = df.withColumn("__dom", url_domain(F.col(url_col)))
    out = work.join(
        F.broadcast(blocked.select(F.lower(F.col("domain")).alias("__dom")).distinct()),
        on="__dom",
        how="left_anti",
    )
    return out.drop("__dom")
