"""Gopher-style quality rules (operators/quality.py)."""

from pyspark.sql import functions as F


GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs to the river "
    "of sparkling water that winds through the valley with tall green trees "
    "and the birds that have nested there sing songs of morning light while "
    "the foxes sleep soundly beneath the warm stones near the bank waiting"
)  # 52 words, mean len in band, stopwords present


def _flags(spark, rows, **kwargs):
    from featureengineer_spark.operators.quality import with_gopher_flags

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_gopher_flags(df, **kwargs).orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_good_document_passes(spark):
    got = _flags(spark, [(1, GOOD)])
    assert got[1]["gopher_pass"] is True
    for k, v in got[1].items():
        if k.startswith("r_"):
            assert v is True, k


def test_word_count_band(spark):
    got = _flags(spark, [(1, "too short"), (2, GOOD)], min_words=50)
    assert got[1]["r_word_count"] is False and got[1]["gopher_pass"] is False
    assert got[2]["r_word_count"] is True


def test_mean_word_length_band(spark):
    short = " ".join(["a b"] * 30)           # mean length 1
    longw = " ".join(["pneumonoultramicroscopic"] * 60)  # mean length 24
    got = _flags(spark, [(1, short), (2, longw)])
    assert got[1]["r_mean_word_len"] is False
    assert got[2]["r_mean_word_len"] is False


def test_symbol_ratio(spark):
    spam = GOOD + " " + " ".join(["###"] * 20)
    got = _flags(spark, [(1, spam)])
    assert got[1]["r_symbol_ratio"] is False


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item number %d with words" % i for i in range(10)])
    ells = "\n".join(["this line trails off..." for _ in range(10)])
    got = _flags(spark, [(1, bullets), (2, ells)])
    assert got[1]["r_bullet_lines"] is False
    assert got[2]["r_ellipsis_lines"] is False


def test_alpha_word_and_stopword_rules(spark):
    digits = " ".join(str(i) for i in range(60))
    nostop = " ".join(["zylophant"] * 60)
    got = _flags(spark, [(1, digits), (2, nostop)])
    assert got[1]["r_alpha_words"] is False
    assert got[2]["r_stopwords"] is False


def test_null_and_empty_text(spark):
    got = _flags(spark, [(1, None), (2, "")])
    for i in (1, 2):
        assert got[i]["gopher_pass"] is False
        assert got[i]["r_word_count"] is False


def test_gopher_filter_schema_and_rows(spark):
    from featureengineer_spark.operators.quality import gopher_filter

    df = spark.createDataFrame(
        [(1, GOOD), (2, "short"), (3, None)], "doc_id long, text string"
    )
    out = gopher_filter(df)
    assert out.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_rules_are_map_only(spark):
    from featureengineer_spark.operators.quality import with_gopher_flags

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit(GOOD).alias("text")
    )
    plan = with_gopher_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
