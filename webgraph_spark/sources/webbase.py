"""WebBase crawl-dump converter (``c/webbase.c:20-87`` +
``webbase/Hasher.java:55-80`` + ``webbase/Converter.java:100-160``).

The reference pipeline is three sequential single-reader programs:

1. ``webbase.c`` — scans the crawl dump (pages delimited by a magic cookie
   line, then a ``URL: <url>`` line, three header lines, then one outlink
   URL per line) and emits per-page URL lists, applying filters;
2. ``Hasher.java`` — assigns dense ids to valid page URLs in first-seen
   order (CRC64 map);
3. ``Converter.java`` — resolves each page's outlinks against that map
   (unresolvable links are "broken" and dropped), dedups them per page
   (``IntRBTreeSet``), and writes a BVGraph.

Spark-first re-expression: the magic cookie makes the dump *splittable* —
``spark.read.text(path, lineSep=cookie)`` yields one row per page record
at any byte offset (Hadoop's delimited record reader scans forward to the
next cookie), so parsing is an embarrassingly parallel narrow scan with the
filters as pure column expressions; id minting reuses
:func:`~webgraph_spark.sources.ids.mint_dense_ids` and link resolution is
one inner hash join (broken links drop, exactly the Converter's rule).

Filter parity with ``webbase.c``:

- page URL: CR-trimmed (``fixCR``), must start ``URL: `` with a
  case-insensitive ``http`` protocol (``webbase.c:52``), must not end in
  ``robots.txt`` (``:43``), must contain no control/space character
  (``:46-49``); the leading alphabetic protocol run is lowercased
  (``fixProtocol``, ``:13-18``);
- outlink lines: skipped when they contain ANY char <= 0x20
  (``webbase.c:77-79`` — note this intentionally reproduces the quirk that
  CRLF-terminated outlink lines are dropped wholesale, since ``gets``
  leaves the ``\\r`` in the buffer), must start with literal lowercase
  ``http`` (case-SENSITIVE ``strncmp``, ``:81`` — unlike the page check),
  then protocol-lowercased.

Documented deviations: ids are minted in URL sort order (deterministic at
any parallelism) rather than the single-reader first-seen order — the same
deviation :func:`read_scattered_arcs` documents — and link matching is by
exact string after protocol lowercasing, without the reference's ``URL2``
normalization pass (``webbase/URL2.java`` — host-case/port/escape
canonicalization; out of semantic scope here, noted as such).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.sources.ids import mint_dense_ids, remap_edges

WEBBASE_COOKIE = "==P=>>>>=i===<<<<=T===>=A===<=!Junghoo!==>"

_CTRL = "[\\x00-\\x20]"  # webbase.c's `<= 32` character class


def _fix_protocol(col):
    """Lowercase the leading alphabetic run (``webbase.c fixProtocol``)."""
    return F.concat(
        F.lower(F.regexp_extract(col, "^[A-Za-z]*", 0)),
        F.regexp_replace(col, "^[A-Za-z]*", ""),
    )


def read_webbase_pages(spark: SparkSession, path: str) -> DataFrame:
    """Parse a WebBase crawl dump -> ``(url string, links array<string>)``,
    one row per kept page, all ``webbase.c`` filters applied (module
    docstring). Splittable narrow scan; no shuffle."""
    records = spark.read.text(path, lineSep=WEBBASE_COOKIE + "\n")
    lines = F.split(F.col("value"), "\n")
    url_line = F.regexp_replace(F.element_at(lines, 1), "\r$", "")  # fixCR
    url = _fix_protocol(F.substring(url_line, 6, 1 << 30))
    n_links = F.greatest(F.size(lines) - 4, F.lit(0))
    raw_links = F.slice(lines, 5, n_links)
    links = F.transform(
        F.filter(
            raw_links,
            # any char <= 0x20 kills the line (CRLF quirk included), and the
            # link must start with literal lowercase "http"
            lambda s: (F.length(s) > 0)
            & ~s.rlike(_CTRL)
            & s.startswith("http"),
        ),
        _fix_protocol,
    )
    return (
        records.select(url_line.alias("__ul"), url.alias("url"), links.alias("links"))
        .filter(
            F.col("__ul").startswith("URL: ")
            & F.lower(F.col("url")).startswith("http")
            & ~F.col("url").endswith("robots.txt")
            & ~F.col("url").rlike(_CTRL)
        )
        .select("url", "links")
    )


def webbase_to_graph(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Hasher + Converter: ``(node_map(id, key), edges(src, dst))``.

    Only PAGE urls get ids (the CRC map holds crawled pages, nothing else);
    outlinks resolve by inner join — unresolved = the Converter's "broken
    links", dropped — and duplicate arcs collapse ("double links",
    ``Converter.java:124``)."""
    node_map = mint_dense_ids(pages.select(F.col("url").alias("key")), ["key"])
    raw = pages.select(
        F.col("url").alias("k_src"), F.explode("links").alias("k_dst")
    )
    edges = remap_edges(raw, node_map, src_key=["k_src"], dst_key=["k_dst"])
    return node_map, edges


def write_webbase_dump(records: list[tuple[str, list[str]]], path: str) -> None:
    """Test/debug sink: serialize ``(url_line_body, links)`` records into the
    crawl-dump layout (cookie, ``URL:`` line, three header lines, one link
    per line) so the reader can be exercised round-trip."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for url, links in records:
            f.write(WEBBASE_COOKIE + "\n")
            f.write(f"URL: {url}\n")
            f.write("Date: today\nStatus: 200\n\n")
            for link in links:
                f.write(link + "\n")
