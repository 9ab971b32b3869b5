"""Text-analysis operators over the driver documents table + fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    langid,
    token_count,
    with_text_stats,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello world"), (2, "  a  b\tc \n"), (3, ""), (4, "x,y!z")],
        "id long, text string",
    )
    got = {
        r["id"]: (r["tc"], r["bc"])
        for r in df.select(
            "id",
            token_count("text").alias("tc"),
            bpe_token_count("text").alias("bc"),
        ).collect()
    }
    assert got[1] == (2, 2)
    assert got[2] == (3, 3)
    assert got[3][0] == 0
    assert got[4] == (1, 5)  # x , y ! z


def test_text_stats_ranges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = with_text_stats(docs)
    row = stats.agg(
        F.min("quality_score").alias("lo"),
        F.max("quality_score").alias("hi"),
        F.min("punct_ratio").alias("plo"),
        F.max("punct_ratio").alias("phi"),
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0
    assert 0.0 <= row["plo"] <= row["phi"] <= 1.0
    # n_chars column in the table should match our computed length.
    bad = stats.filter(F.col("n_chars_actual") != F.col("n_chars")).count()
    assert bad == 0


def test_langid_votes(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog was in the house"),
            (2, "der Hund und die Katze ist nicht da"),
            (3, "le chat est dans la maison avec nous"),
            (4, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in langid(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "id long, text string",
    )
    fps = {r["id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]
