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


#: Tag-stripping passes for :func:`extract_html_text`, in order. Every
#: regex is supported identically by Java regex (Spark) and RE2 (DuckDB):
#: inline flags (?is), lazy quantifiers, \b word boundary.
_HTML_DROP_BLOCKS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" decodes to "&lt;" not "<"
)
_ANCHOR_REGEX = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG_REGEX = r"(?s)<[^>]*>"


def extract_html_text(col: F.Column) -> F.Column:
    """Visible text of an HTML document as one expression chain:
    drop script/style/comment blocks, replace every remaining tag with a
    space, decode the six standard entities, collapse whitespace.

    A deterministic regex extractor (the boilerplate-agnostic first
    stage of CCNet/RefinedWeb-style web pipelines — rule-based content
    selection like link-density pruning builds on the stats below).
    Pure codegen'd ``regexp_replace`` chain: no shuffle, no Python."""
    c = F.coalesce(col, F.lit(""))
    for pat in _HTML_DROP_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _TAG_REGEX, " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def with_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Add ``out_col`` = the visible text of ``html_col``."""
    return df.withColumn(out_col, extract_html_text(F.col(html_col)))


def with_html_stats(
    df: DataFrame, html_col: str = "html", prefix: str = ""
) -> DataFrame:
    """Boilerplate signals for rule-based web curation: ``link_density``
    (fraction of the visible text that lives inside anchor tags — the
    classic nav/boilerplate discriminator), ``tag_count``, and
    ``text_ratio`` (visible-text chars / raw HTML chars). All pure
    expressions over the raw column; the anchor scan is one
    ``regexp_extract_all`` + higher-order sum."""
    raw = F.coalesce(F.col(html_col), F.lit(""))
    text = extract_html_text(F.col(html_col))
    anchors = F.regexp_extract_all(raw, F.lit(_ANCHOR_REGEX), 1)
    anchor_chars = F.aggregate(
        F.transform(
            anchors,
            lambda a: F.length(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(a, _TAG_REGEX, " "), r"\s+", " "
                    )
                )
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    text_len = F.length(text)
    return (
        df.withColumn(
            prefix + "link_density",
            (anchor_chars / F.greatest(text_len, F.lit(1))).cast("double"),
        )
        .withColumn(
            prefix + "tag_count",
            F.size(F.regexp_extract_all(raw, F.lit(_TAG_REGEX), 0)).cast("int"),
        )
        .withColumn(
            prefix + "text_ratio",
            (text_len / F.greatest(F.length(raw), F.lit(1))).cast("double"),
        )
    )
