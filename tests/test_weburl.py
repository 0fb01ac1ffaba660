"""URL canonicalization / URL-keyed dedup / domain blocklist."""

from pyspark.sql import functions as F


def _canon(spark, urls):
    from featureengineer_spark.operators.weburl import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]


def test_canonical_url_normalization(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/?b=2&a=1#frag",
            "http://example.com:80/a//",
            "http://example.com/a?utm_source=x&utm_medium=y&q=1&fbclid=zz",
            "https://example.com/a?gclid=1",
            "http://sub.example.co.uk./p",
            "not a url at ALL",
        ],
    )
    assert got[0] == "https://www.example.com/Path?a=1&b=2"  # port+frag gone, params sorted
    assert got[1] == "http://example.com/a"                  # :80 + trailing slashes gone
    assert got[2] == "http://example.com/a?q=1"              # tracking params stripped
    assert got[3] == "https://example.com/a"                 # only-tracking query → none
    assert got[4] == "http://sub.example.co.uk/p"            # trailing host dot gone
    assert got[5] == "not a url at all"                      # malformed → lowercased passthrough


def test_url_domain(spark):
    from featureengineer_spark.operators.weburl import url_domain

    rows = [
        ("https://a.b.example.com/x",),
        ("http://news.bbc.co.uk:8080/y",),
        ("http://10.0.0.7/z",),
        ("https://localhost/w",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r[0] for r in df.select(url_domain(F.col("url"))).collect()]
    assert got == ["example.com", "bbc.co.uk", "10.0.0.7", "localhost"]


def test_canonicalization_is_map_only(spark):
    """with_canonical_url must not shuffle — it's a pure projection."""
    from featureengineer_spark.operators.weburl import with_canonical_url

    df = spark.range(100).select(
        F.concat(F.lit("https://example.com/p?id="), F.col("id")).alias("url")
    )
    plan = with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_dedup_keeps_first(spark):
    from featureengineer_spark.operators.weburl import url_dedup

    rows = [
        (1, "http://example.com/a?utm_source=x", 20),
        (2, "http://example.com/a", 10),          # same canonical, earlier ts
        (3, "http://example.com/a#frag", 10),     # same canonical, same ts, higher id
        (4, "http://example.com/b", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    kept = sorted(
        r["doc_id"] for r in url_dedup(df, order_col="ts").collect()
    )
    assert kept == [2, 4]  # earliest ts wins, id breaks the tie


def test_filter_blocked_domains_broadcast(spark):
    from featureengineer_spark.operators.weburl import filter_blocked_domains

    rows = [
        (1, "https://spam.example.com/x"),
        (2, "https://ok.org/y"),
        (3, "http://news.bad.co.uk/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = filter_blocked_domains(df, ["example.com", "bad.co.uk"])
    assert [r["doc_id"] for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
