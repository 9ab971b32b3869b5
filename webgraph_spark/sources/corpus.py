"""Deterministic synthetic source-code corpus + edge derivation.

The engine's primary input (BASELINE input_hint) is a table of source-code
rows ``(repo, path, commit, lang, content)``. This module synthesizes one at
arbitrary scale as a *pure function of the row index* — every column is a
Spark expression over ``spark.range``, so the same (seed, shape) produces the
same corpus on 1 core or 1000 executors, with no driver-side data generation.

``content`` embeds ``import <repo>/<path>`` lines whose targets follow a
skewed product law over file indices, so the derived link graph has the
power-ish in-degree skew that the salted shuffle paths must handle
(reference motivation: ``algo/EliasFanoCumulativeOutdegreeList.java:25-35``).

All pseudo-randomness is a Lehmer-style modular mixer in PLAIN BIGINT
ARITHMETIC (no engine-specific hash builtin), so an independent SQL engine
can regenerate the identical corpus: :func:`corpus_sql_ctes` emits DuckDB
CTEs that mirror the generation term for term — the driver's oracle derives
the same rows/edges without ever seeing the Spark output.

Edge derivation mirrors the reference's scattered-arc ingestion
(``ScatteredArcsASCIIGraph.java:57-149``): parse references out of content,
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

# Lehmer-style mixer modulus/multipliers: all intermediates stay < 2^63 for
# any int64 input, so ANSI-mode Spark and DuckDB compute bit-identical
# values with plain BIGINT arithmetic.
_M = 2147483647  # 2^31 - 1 (prime)
_A0, _A1, _A2 = 2654435761, 48271, 16807
_TAG = 40503


def _mix(i: Column, tag: int, seed: int) -> Column:
    """Deterministic uniform-ish value in [0, 2^31-1) from (index, tag, seed).

    Three multiplicative rounds mod the Mersenne prime 2^31-1; expressible
    identically in any SQL engine (see :func:`_mix_sql`)."""
    x = F.pmod(
        F.pmod(i, F.lit(_M)) * _A0 + F.lit(tag * _TAG + (seed % _M) * 1013),
        F.lit(_M),
    )
    x = F.pmod(x * _A1, F.lit(_M))
    return F.pmod(x * _A2, F.lit(_M))


def _mix_sql(i: str, tag: int, seed: int) -> str:
    """DuckDB rendering of :func:`_mix` (operands are nonnegative, so ``%``
    and Spark's ``pmod`` agree)."""
    c = tag * _TAG + (seed % _M) * 1013
    return (
        f"((((({i}) % {_M}) * {_A0} + {c}) % {_M}) * {_A1} % {_M}) "
        f"* {_A2} % {_M}"
    )


def _pm(h: Column, m: int) -> Column:
    return F.pmod(h, F.lit(m)).cast("long")


def _target_fid(gidx: Column, files_per_repo: int, seed: int) -> Column:
    """Skewed target file index in [0, files_per_repo): the floored product
    of three uniform draws, density ~ (ln(F/t))²/2F — low file indices
    become import hubs. Integer-only (requires files_per_repo ≤ 10^6 so the
    triple product stays < 2^63), hence bit-identical across engines —
    unlike a ``pow()``-based log-uniform draw, whose libm rounding can flip
    a ``floor`` at bucket boundaries between engines."""
    f = files_per_repo
    a = _pm(_mix(gidx, 4, seed), f)
    b = _pm(_mix(gidx, 5, seed), f)
    c = _pm(_mix(gidx, 6, seed), f)
    prod = a * b * c
    denom = f * f
    # exact integer division: subtract the remainder, then divide as
    # DECIMAL(38,0) (a double `/` loses exactness once prod exceeds 2^53 —
    # files_per_repo > ~2e5 — and the truncating cast can land one below
    # DuckDB's exact `//`)
    exact = (prod - F.pmod(prod, F.lit(denom))).cast("decimal(38,0)")
    return (exact / F.lit(denom)).cast("long")


def _target_fid_sql(gidx: str, files_per_repo: int, seed: int) -> str:
    f = files_per_repo
    return (
        f"(({_mix_sql(gidx, 4, seed)}) % {f}) * (({_mix_sql(gidx, 5, seed)}) % {f})"
        f" * (({_mix_sql(gidx, 6, seed)}) % {f}) // {f * f}"
    )


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
    - each file has 1..max_imports import lines; target file index follows
      the skewed product law of :func:`_target_fid` (low indices are hubs
      of the transposed graph);
    - with probability ``cross_repo_pct``% an import crosses repos;
    - ``content_sha`` is the generation-time sha256 of ``content``.
    """
    n = n_repos * files_per_repo
    rng = spark.range(n, numPartitions=num_partitions)
    rid = (F.col("id") / files_per_repo).cast("long")
    fid = F.pmod(F.col("id"), F.lit(files_per_repo))

    k_imports = 1 + _pm(_mix(F.col("id"), 1, seed), max_imports)

    def gidx(jj: Column) -> Column:
        return F.col("id") * max_imports + jj

    imports_arr = F.transform(
        F.sequence(F.lit(0), k_imports - 1),
        lambda jj: F.format_string(
            "import repo%04d/src/mod_%05d.src",
            F.when(
                _pm(_mix(gidx(jj), 2, seed), 100) < F.lit(cross_repo_pct),
                _pm(_mix(gidx(jj), 3, seed), n_repos),
            ).otherwise(rid),
            _target_fid(gidx(jj), files_per_repo, seed),
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
            (_pm(_mix(F.col("id"), 7, seed), len(_LANGS)) + 1).cast("int"),
        ).alias("lang"),
        content.alias("content"),
    )
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def corpus_sql_ctes(
    n_repos: int = 10,
    files_per_repo: int = 100,
    max_imports: int = 8,
    cross_repo_pct: int = 10,
    seed: int = 42,
) -> dict[str, str]:
    """DuckDB CTEs regenerating the identical corpus, for oracle SQL.

    Returns ``{"corpus": ..., "edges": ...}``:

    - ``corpus(id, repo, path, content, content_sha)`` — content built with
      the same printf/list expressions (sha256 output format matches
      Spark's sha2 lowercase hex);
    - ``edges(src, dst)`` — the deduplicated, loop-free dense-id edge list
      derived ARITHMETICALLY (dst = dst_repo·files + dst_fid). Dense ids
      minted in (repo, path) sort order coincide with the row index because
      the zero-padded repo/path strings are monotone in it.
    """
    n = n_repos * files_per_repo
    f = files_per_repo
    g = f"(i.id * {max_imports} + j)"
    dst_repo = (
        f"CASE WHEN ({_mix_sql(g, 2, seed)}) % 100 < {cross_repo_pct} "
        f"THEN ({_mix_sql(g, 3, seed)}) % {n_repos} "
        f"ELSE i.id // {f} END"
    )
    dst_fid = _target_fid_sql(g, f, seed)
    imports = (
        f"imp AS (SELECT i.id, j, ({dst_repo}) AS dst_repo, "
        f"({dst_fid}) AS dst_fid "
        f"FROM idx i, LATERAL unnest(range(1 + ({_mix_sql('i.id', 1, seed)}) "
        f"% {max_imports})) AS t(j))"
    )
    # NB: standard SQL string literals do not interpret backslash escapes —
    # newlines must be spliced in with chr(10)
    content = (
        f"printf('# module %d', i.id) || chr(10) || imports_txt || chr(10) || "
        f"'def main_' || i.id || '():' || chr(10) || '    return ' || "
        f"sha256('{seed}' || i.id) || chr(10)"
    )
    corpus = (
        f"imptxt AS (SELECT id, string_agg("
        f"printf('import repo%04d/src/mod_%05d.src', dst_repo, dst_fid), "
        f"chr(10) ORDER BY j) AS imports_txt FROM imp GROUP BY id), "
        f"corpus AS (SELECT i.id, printf('repo%04d', i.id // {f}) AS repo, "
        f"printf('src/mod_%05d.src', i.id % {f}) AS path, "
        f"({content}) AS content, "
        f"sha256({content}) AS content_sha "
        f"FROM idx i JOIN imptxt ON imptxt.id = i.id)"
    )
    edges = (
        f"cedges AS (SELECT DISTINCT id AS src, "
        f"dst_repo * {f} + dst_fid AS dst FROM imp "
        f"WHERE id <> dst_repo * {f} + dst_fid)"
    )
    return {
        "idx": f"idx AS (SELECT unnest(range({n})) AS id)",
        "imp": imports,
        "corpus": corpus,
        "edges": edges,
    }


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
