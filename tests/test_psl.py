"""Full public-suffix-list matcher (sources/psl.py) — wildcard, exception,
private-section, longest-match, and Guava-gate semantics
(``BuildHostMap.java:86-90``), plus fast-path/join-path agreement."""

from __future__ import annotations

from webgraph_spark.sources.hosts import top_private_domain_of
from webgraph_spark.sources.psl import (
    load_psl_rules,
    psl_max_labels,
    top_private_domain_join,
)

CASES = {
    # 1-label public suffix -> registrable domain
    "www.example.com": "example.com",
    "a.b.c.example.org": "example.org",
    # 2-label registry suffix (including one the old embedded subset
    # lacked: .kr) -> one label + suffix
    "a.b.example.co.uk": "example.co.uk",
    "deep.sub.example.co.kr": "example.co.kr",
    "a.example.com.tr": "example.com.tr",
    # a host that IS a public suffix stays unchanged (Guava:
    # publicSuffixIndex == 0 -> not *under* a public suffix)
    "co.uk": "co.uk",
    "example.co.uk": "example.co.uk",
    # wildcard rule *.ck: every <label>.ck is a public suffix
    "y.x.example.ck": "x.example.ck",
    "x.example.ck": "x.example.ck",
    "example.ck": "example.ck",
    # exception rule !www.ck beats the wildcard: public suffix is ck
    "www.ck": "www.ck",
    "a.www.ck": "www.ck",
    # private-section rules count (Guava topPrivateDomain parity)
    "a.foo.blogspot.com": "foo.blogspot.com",
    "foo.blogspot.com": "foo.blogspot.com",
    # 3-label private rule
    "c.b.s3.amazonaws.com": "b.s3.amazonaws.com",
    # unknown TLD -> unchanged (isUnderPublicSuffix gate)
    "svc.cluster.internal": "svc.cluster.internal",
    # dotted / hex addresses never collapse
    "10.0.3.7": "10.0.3.7",
    "0x7f.0x0.0x0.0x1": "0x7f.0x0.0x0.0x1",
    "fe80:1:2": "fe80:1:2",
}


def test_load_rules_shape():
    rules = load_psl_rules()
    assert len(rules) > 800
    keys = {k for k, _ in rules}
    assert "co.kr" in keys and "com.tr" in keys and "*.ck" in keys
    assert ("www.ck", True) in rules  # exception parsed, '!' stripped
    assert psl_max_labels() >= 3


def test_join_matcher_semantics(spark):
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    got = {
        r["host"]: r["tpd"]
        for r in top_private_domain_join(df, "host").collect()
    }
    assert got == CASES


def test_fast_path_agrees_with_join_matcher(spark):
    """The column fast path expresses every rule shape in the packaged
    snapshot (<=3-label exact, 2-label wildcard/exception), so on these
    hosts the two paths must be identical."""
    df = spark.createDataFrame([(h,) for h in CASES], "host string")
    out = top_private_domain_join(df, "host").withColumn(
        "fast", top_private_domain_of("host")
    )
    rows = out.collect()
    assert {r["host"]: r["fast"] for r in rows} == {
        r["host"]: r["tpd"] for r in rows
    }


def test_join_matcher_preserves_other_columns_and_nulls(spark):
    df = spark.createDataFrame(
        [("www.example.com", 3), (None, 1), ("", 2)],
        "host string, n long",
    )
    rows = {
        r["host"]: (r["tpd"], r["n"])
        for r in top_private_domain_join(df, "host").collect()
    }
    assert rows["www.example.com"] == ("example.com", 3)
    assert rows[None] == (None, 1)
    assert rows[""] == ("", 2)
