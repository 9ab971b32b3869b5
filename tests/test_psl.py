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
    # a host that IS a 3-label rule stays unchanged (publicSuffixIndex==0
    # gate — the round-5 fast-path fix's divergent case)
    "s3.amazonaws.com": "s3.amazonaws.com",
    # unknown TLD -> unchanged (isUnderPublicSuffix gate)
    "svc.cluster.internal": "svc.cluster.internal",
    # dotted / hex addresses never collapse
    "10.0.3.7": "10.0.3.7",
    "0x7f.0x0.0x0.0x1": "0x7f.0x0.0x0.0x1",
    "fe80:1:2": "fe80:1:2",
}

# Rules DEEPER than the fast path expresses (4-label wildcards): join
# matcher only — the fast path documents that it cannot express these and
# deliberately falls back to shallower matches (hosts.py module docstring).
DEEP_CASES = {
    # *.compute.amazonaws.com: every <region>.compute.amazonaws.com is a
    # public suffix, so the ec2 host itself is the registrable domain
    "ec2-54-0-0-1.us-east-1.compute.amazonaws.com":
        "ec2-54-0-0-1.us-east-1.compute.amazonaws.com",
    "x.ec2-host.eu-west-2.compute.amazonaws.com":
        "ec2-host.eu-west-2.compute.amazonaws.com",
    # a host that IS a wildcard-matched 4-label suffix stays unchanged
    "us-east-1.compute.amazonaws.com": "us-east-1.compute.amazonaws.com",
    # compute.amazonaws.com matches NO rule after the upstream-parity fix
    # (upstream has *.compute.amazonaws.com, not the exact rule the
    # round-4 snapshot carried) -> amazonaws.com under the .com rule
    "compute.amazonaws.com": "amazonaws.com",
    "x.a.b.elb.amazonaws.com": "a.b.elb.amazonaws.com",
}


def test_load_rules_shape():
    rules = load_psl_rules()
    assert len(rules) > 800
    keys = {k for k, _ in rules}
    assert "co.kr" in keys and "com.tr" in keys and "*.ck" in keys
    assert ("www.ck", True) in rules  # exception parsed, '!' stripped
    # upstream-parity: the compute rule is the 4-label WILDCARD, not the
    # exact rule the round-4 snapshot carried
    assert "*.compute.amazonaws.com" in keys
    assert "compute.amazonaws.com" not in keys
    assert psl_max_labels() >= 4


def test_join_matcher_semantics(spark):
    all_cases = {**CASES, **DEEP_CASES}
    df = spark.createDataFrame([(h,) for h in all_cases], "host string")
    got = {
        r["host"]: r["tpd"]
        for r in top_private_domain_join(df, "host").collect()
    }
    assert got == all_cases


def test_fast_path_agrees_with_join_matcher(spark):
    """On hosts governed by rule shapes the column fast path expresses
    (<=3-label exact, 2-label wildcard/exception) the two paths must be
    identical; DEEP_CASES (4-label wildcards) are join-matcher-only by
    design and excluded here."""
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
