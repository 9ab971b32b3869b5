"""Deterministic synthetic source-code corpus + edge derivation.

The engine's primary input (BASELINE input_hint) is a table of source-code
rows ``(repo, path, commit, lang, content)``. This module synthesizes one at
arbitrary scale as a *pure function of the row index* — every column is a
Spark expression over ``spark.range``, so the same (seed, shape) produces the
same corpus on 1 core or 1000 executors, with no driver-side data generation.

``content`` embeds ``import <repo>/<path>`` lines whose targets follow a
log-uniform (Zipf-like) distribution over file indices, so the derived link
graph has the power-law in-degree skew that the salted shuffle paths must
handle (reference motivation: ``algo/EliasFanoCumulativeOutdegreeList.java:25-35``).

Edge derivation mirrors the reference's scattered-arc ingestion
(``ScatteredArcsASCIIGraph.java:57-139``): parse references out of content,
compact arbitrary keys to dense ids, drop duplicates, optionally drop loops.
The per-row invariant is ``sha256(content)`` (``sha2(content, 256)``),
computed at generation time and re-checkable at any point downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.sources.ids import mint_dense_ids, remap_edges

IMPORT_RE = r"import ([A-Za-z0-9_]+)/([A-Za-z0-9_/.]+)"

_LANGS = ["py", "java", "go", "rs"]


def _pm(h: Column, m: int) -> Column:
    return F.pmod(h, F.lit(m)).cast("long")


def synth_corpus(
    spark: SparkSession,
    n_repos: int = 10,
    files_per_repo: int = 100,
    max_imports: int = 8,
    cross_repo_pct: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build ``corpus(repo, path, commit, lang, content, content_sha)``.

    - ``repo`` = ``repo%04d``, ``path`` = ``src/mod_%05d.src`` (dense shape);
    - each file has 1..max_imports import lines; target file index is
      ``floor(F**u) - 1`` with u uniform — log-uniform, heavily skewed toward
      low file indices (those files become hubs of the transposed graph);
    - with probability ``cross_repo_pct``% an import crosses repos;
    - ``content_sha`` is the generation-time sha256 of ``content``.
    """
    n = n_repos * files_per_repo
    rng = spark.range(n, numPartitions=num_partitions)
    rid = (F.col("id") / files_per_repo).cast("long")
    fid = F.pmod(F.col("id"), F.lit(files_per_repo))

    def h(*cols: Column | str | int) -> Column:
        args = [F.lit(c) if isinstance(c, (str, int)) else c for c in cols]
        return F.xxhash64(F.lit(seed), F.col("id"), *args)

    k_imports = 1 + _pm(h("deg"), max_imports)

    # Target file index is log-uniform (floor(F**u)) -> Zipf-like popularity
    # of low indices; target repo crosses repos with cross_repo_pct%.
    imports_arr = F.transform(
        F.sequence(F.lit(0), k_imports - 1),
        lambda jj: F.format_string(
            "import repo%04d/src/mod_%05d.src",
            F.when(
                _pm(F.xxhash64(F.lit(seed), F.col("id"), jj, F.lit("x")), 100)
                < F.lit(cross_repo_pct),
                _pm(F.xxhash64(F.lit(seed), F.col("id"), jj, F.lit("r")), n_repos),
            ).otherwise(rid),
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(files_per_repo - 1),
                    F.floor(
                        F.pow(
                            F.lit(float(files_per_repo)),
                            _pm(
                                F.xxhash64(F.lit(seed), F.col("id"), jj, F.lit("t")),
                                1 << 20,
                            )
                            / float(1 << 20),
                        )
                    )
                    - 1,
                ),
            ).cast("long"),
        ),
    )
    body = F.concat(
        F.lit("def main_"),
        F.col("id").cast("string"),
        F.lit("():\n    return "),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256),
        F.lit("\n"),
    )
    content = F.concat(
        F.format_string("# module %d\n", F.col("id")),
        F.array_join(imports_arr, "\n"),
        F.lit("\n"),
        body,
    )
    corpus = rng.select(
        F.format_string("repo%04d", rid).alias("repo"),
        F.format_string("src/mod_%05d.src", fid).alias("path"),
        F.substring(
            F.sha2(F.concat(F.lit("commit"), F.col("id").cast("string")), 256), 1, 12
        ).alias("commit"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in _LANGS]),
            (_pm(h("lang"), len(_LANGS)) + 1).cast("int"),
        ).alias("lang"),
        content.alias("content"),
    )
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def verify_content_sha(corpus: DataFrame) -> int:
    """Per-row invariant: stored sha256 == recomputed sha256. Returns #violations."""
    return corpus.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha")
    ).count()


def extract_references(corpus: DataFrame) -> DataFrame:
    """Parse import targets out of ``content`` -> raw keyed arcs.

    Returns ``(repo, path, dst_repo, dst_path)`` one row per import statement
    (duplicates preserved; deduplication happens at remap, matching the
    reference's ingestion dedup at ``Transform.java:1575-1592``).
    """
    refs = corpus.select(
        "repo",
        "path",
        F.explode(F.expr(f"regexp_extract_all(content, '{IMPORT_RE}', 0)")).alias(
            "stmt"
        ),
    )
    return refs.select(
        "repo",
        "path",
        F.regexp_extract("stmt", IMPORT_RE, 1).alias("dst_repo"),
        F.regexp_extract("stmt", IMPORT_RE, 2).alias("dst_path"),
    )


def corpus_nodes(corpus: DataFrame) -> DataFrame:
    """Node map ``(id, repo, path)`` with dense ids minted in key order."""
    return mint_dense_ids(corpus, ["repo", "path"])


def corpus_edges(
    corpus: DataFrame, nodes: DataFrame | None = None, no_loops: bool = False
) -> DataFrame:
    """Full derivation: corpus -> deduplicated ``edges(src, dst)``.

    Inner joins drop imports of files that do not exist (dangling references);
    ``no_loops`` additionally drops self-imports (``Transform.java:125-139``).
    """
    if nodes is None:
        nodes = corpus_nodes(corpus)
    refs = extract_references(corpus)
    edges = remap_edges(
        refs, nodes, src_key=["repo", "path"], dst_key=["dst_repo", "dst_path"]
    )
    if no_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return edges
