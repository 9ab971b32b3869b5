from __future__ import annotations

from pyspark.sql import functions as F

from webgraph_spark.sources.hosts import (
    build_host_map,
    host_of,
    top_private_domain_of,
    url_host_ids,
)


def _urls(spark, us):
    return spark.createDataFrame([(u,) for u in us], "url string")


def test_host_of(spark):
    df = _urls(
        spark,
        [
            "https://www.Example.COM/path?q=1",
            "http://user:pw@a.b.co.uk:8080/x",
            "https://10.0.3.7/x",
            "ftp://Host.Internal/readme",
        ],
    ).select(host_of("url").alias("h"))
    assert [r["h"] for r in df.collect()] == [
        "www.example.com",
        "a.b.co.uk",
        "10.0.3.7",
        "host.internal",
    ]


def test_top_private_domain(spark):
    cases = {
        # under a 1-label public suffix -> registrable domain
        "www.example.com": "example.com",
        "a.b.c.example.org": "example.org",
        # under a 2-label public suffix -> one label + suffix
        "a.b.example.co.uk": "example.co.uk",
        # exactly the registrable domain stays itself
        "example.co.uk": "example.co.uk",
        # not under a known public suffix -> unchanged (isUnderPublicSuffix
        # gate, BuildHostMap.java:86-90)
        "svc.cluster.internal": "svc.cluster.internal",
        # dotted / hex addresses are never collapsed (DOTTED_ADDRESS)
        "10.0.3.7": "10.0.3.7",
        "0x7f.0x0.0x0.0x1": "0x7f.0x0.0x0.0x1",
        "fe80:1:2": "fe80:1:2",
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select("host", top_private_domain_of("host").alias("tpd"))
    got = {r["host"]: r["tpd"] for r in df.collect()}
    assert got == cases


def test_build_host_map_counts_and_dense_ids(spark):
    urls = _urls(
        spark,
        [
            "https://www.a.com/1",
            "https://www.a.com/2",
            "https://cdn.a.com/3",
            "https://b.co.uk/4",
            "https://x.b.co.uk/5",
        ],
    )
    hm = {r["host"]: (r["host_id"], r["n_urls"]) for r in
          build_host_map(urls).collect()}
    # dense ids 0..n-1 in lexicographic host order
    assert hm == {
        "b.co.uk": (0, 1),
        "cdn.a.com": (1, 1),
        "www.a.com": (2, 2),
        "x.b.co.uk": (3, 1),
    }
    tpd = {r["host"]: r["n_urls"] for r in
           build_host_map(urls, top_private_domain=True).collect()}
    assert tpd == {"a.com": 3, "b.co.uk": 2}


def test_url_host_ids_maps_every_url(spark):
    urls = _urls(
        spark,
        ["https://www.a.com/1", "https://b.org/2", "https://www.a.com/3"],
    )
    out = url_host_ids(urls)
    assert out.count() == 3
    by_host = {r["url"]: r["host_id"] for r in out.collect()}
    assert by_host["https://www.a.com/1"] == by_host["https://www.a.com/3"]
    assert len(set(by_host.values())) == 2
    # host_id is dense over hosts
    assert out.agg(F.max("host_id")).collect()[0][0] == 1
