"""Host map over a URL table: host extraction, top-private-domain collapse.

Reference counterpart: ``BuildHostMap.java:57-103`` — reads URLs, emits one
host per URL (or, with the ``topPrivateDomain`` switch, the top private
domain computed via the public-suffix list, skipping dotted/numeric
addresses), a dense host index, and per-host URL counts.

Spark-first differences, documented:

- The reference assigns host indices in *input-stream first-appearance
  order*, which is not a property of a distributed dataset; we mint dense
  ids in lexicographic host order via the scalable two-pass
  :func:`webgraph_spark.sources.ids.mint_dense_ids` (no single-partition
  window), which is deterministic for any input partitioning.
- The public-suffix rule uses an embedded subset of the public-suffix list
  (publicsuffix.org) covering 1- and 2-label suffixes — enough to express
  the reference's ``InternetDomainName.topPrivateDomain()`` semantics
  (``isUnderPublicSuffix`` gate included: a host *not* under a known public
  suffix is kept unchanged, and dotted/hex addresses are never collapsed,
  mirroring ``BuildHostMap.DOTTED_ADDRESS``).

Everything is pure column expressions — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webgraph_spark.sources.ids import mint_dense_ids

# Mirrors BuildHostMap.DOTTED_ADDRESS (anchored): hex/colon addresses and
# dotted decimal-or-0x-hex addresses.
DOTTED_ADDRESS = (
    r"^(([0-9A-Fa-f]+[:])*[0-9A-Fa-f]+"
    r"|(((0x[0-9A-Fa-f]+)|([0-9]+))\.)*((0x[0-9A-Fa-f]+)|([0-9]+)))$"
)

# Embedded public-suffix subset (publicsuffix.org; public knowledge).
# 1-label suffixes: generic TLDs + common ccTLDs used bare.
PUBLIC_SUFFIX_1 = (
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "dev", "app", "xyz", "de", "fr", "it", "nl", "eu", "us",
)
# 2-label suffixes: registry-controlled second-level domains.
PUBLIC_SUFFIX_2 = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "co.nz", "co.in", "co.za",
    "com.br", "com.cn", "com.mx", "com.sg",
)

_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url: Column | str) -> Column:
    """Lower-cased host of a URL (authority minus userinfo/port), like
    ``new URI(s).getHost()`` in ``BuildHostMap.java:84``."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _URL_HOST_RE, 1))


def top_private_domain_of(host: Column | str) -> Column:
    """Top private domain of a host per the embedded public-suffix subset
    (``BuildHostMap.java:86-90`` semantics): dotted/hex addresses and hosts
    not under a known public suffix are returned unchanged; otherwise the
    registrable domain (one label + the public suffix)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    under2 = last2.isin(*PUBLIC_SUFFIX_2) & (n >= 3)
    under1 = last1.isin(*PUBLIC_SUFFIX_1) & (n >= 2)
    return (
        F.when(h.rlike(DOTTED_ADDRESS), h)
        .when(under2, last3)
        .when(under1, last2)
        .otherwise(h)
    )


def build_host_map(
    urls: DataFrame, url_col: str = "url", top_private_domain: bool = False
) -> DataFrame:
    """Host map of a URL table (``BuildHostMap.run``): one row per distinct
    host with ``(host, host_id, n_urls)``.

    ``host_id`` is dense 0..n_hosts-1 in lexicographic host order (see
    module docstring for why not first-appearance order). With
    ``top_private_domain=True`` hosts are first collapsed to their top
    private domain, mirroring the reference's ``-t`` switch.
    """
    h = host_of(url_col)
    if top_private_domain:
        h = top_private_domain_of(h)
    counts = (
        urls.select(h.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    ids = mint_dense_ids(counts.select("host"), ["host"], id_col="host_id")
    return counts.join(ids, "host").select("host", "host_id", "n_urls")


def url_host_ids(
    urls: DataFrame, url_col: str = "url", top_private_domain: bool = False
) -> DataFrame:
    """Per-URL host index (the reference's ``map`` output): the input plus
    ``host`` and ``host_id`` columns — a broadcast-friendly dim join when
    the host table is small, a plain shuffle join otherwise (Spark/AQE
    picks; the host table is ~|hosts| rows, tiny next to |urls|)."""
    hm = build_host_map(urls, url_col, top_private_domain)
    h = host_of(url_col)
    if top_private_domain:
        h = top_private_domain_of(h)
    return urls.withColumn("host", h).join(hm, "host")
