"""Public-suffix-list matching: full-list top-private-domain collapse.

Reference counterpart: ``BuildHostMap.java:86-90`` computes
``InternetDomainName.topPrivateDomain()`` via Guava's bundled copy of the
publicsuffix.org list. This module ships a curated snapshot of that list
(``data/public_suffix_list.dat``, upstream file format — drop the complete
upstream file over it for the full list, zero code changes) and implements
the matching algorithm Spark-first:

- rules are parsed once on the driver and BROADCAST as a ~1k-row dim table;
- each distinct host explodes into its ≤ ``max_rule_labels`` candidate
  suffixes (exact and wildcard forms) as pure column expressions
  (``transform``/``slice``/``array_join`` — whole-stage codegen, no UDF);
- one broadcast equi-join against the rules table + one hash aggregate
  picks the prevailing rule per host (exception rules beat all, else the
  longest match — the publicsuffix.org algorithm);
- the registrable domain is then a label-slice projection.

Guava parity notes (all deliberate):

- No implicit ``*`` rule: a host whose suffix matches NO rule is returned
  unchanged (Guava's ``isUnderPublicSuffix`` gate, which the reference
  applies before collapsing — unknown TLDs don't collapse).
- A host that IS a public suffix (``co.uk``) is returned unchanged
  (Guava: ``publicSuffixIndex == 0`` → not *under* a public suffix).
- The PRIVATE section of the list counts (Guava's ``topPrivateDomain``
  treats ``blogspot.com`` et al. as public suffixes).
- Dotted/hex addresses never collapse (``BuildHostMap.DOTTED_ADDRESS``).

At scale the candidate explode + rules join runs on the DISTINCT host
table (|hosts| rows, tiny next to |urls|); per-URL collapse is then a plain
host-keyed join against the minted mapping.
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mirrors BuildHostMap.DOTTED_ADDRESS (anchored): hex/colon addresses and
# dotted decimal-or-0x-hex addresses.
DOTTED_ADDRESS = (
    r"^(([0-9A-Fa-f]+[:])*[0-9A-Fa-f]+"
    r"|(((0x[0-9A-Fa-f]+)|([0-9]+))\.)*((0x[0-9A-Fa-f]+)|([0-9]+)))$"
)


@lru_cache(maxsize=1)
def load_psl_rules() -> tuple[tuple[str, bool], ...]:
    """Parsed rules from the packaged list file: ``(key, is_exception)``
    pairs, where wildcard keys keep their ``*.`` prefix and exception keys
    drop their ``!``. Upstream format: one rule per line, ``//`` comments,
    blank lines ignored; both ICANN and PRIVATE sections retained (see
    module docstring)."""
    text = (
        resources.files("webgraph_spark.sources")
        .joinpath("data/public_suffix_list.dat")
        .read_text(encoding="utf-8")
    )
    rules: list[tuple[str, bool]] = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("//"):
            continue
        exc = ln.startswith("!")
        rules.append((ln[1:].lower() if exc else ln.lower(), exc))
    return tuple(rules)


@lru_cache(maxsize=1)
def psl_max_labels() -> int:
    """Label count of the longest rule — bounds candidate generation."""
    return max(r.count(".") + 1 for r, _ in load_psl_rules())


def _rules_df(spark) -> DataFrame:
    return spark.createDataFrame(
        list(load_psl_rules()), "key string, exc boolean"
    )


def top_private_domain_join(
    df: DataFrame, host_col: str = "host", out_col: str = "tpd"
) -> DataFrame:
    """``df`` plus ``out_col``: each host's top private domain under the
    packaged public-suffix list (full algorithm — wildcards, exceptions,
    longest-match; Guava-parity gates per the module docstring).

    Plan shape: distinct hosts → candidate-suffix explode (≤ max_rule_labels
    structs/host) → broadcast join with the rules dim → hash-agg argmax →
    label-slice projection → host-keyed join back onto ``df``. The
    explode/join subtree touches |distinct hosts| rows only.
    """
    spark = df.sparkSession
    kmax = psl_max_labels()
    hosts = df.select(F.col(host_col).alias("__h")).distinct()

    labels = F.split(F.col("__h"), r"\.")
    n = F.size(labels)

    def cand(k: Column) -> Column:
        exact = F.array_join(F.slice(labels, n - k + 1, k), ".")
        wild = F.when(
            k >= F.lit(2),
            F.concat(
                F.lit("*."),
                F.array_join(F.slice(labels, n - k + 2, k - 1), "."),
            ),
        )
        return F.struct(k.alias("k"), exact.alias("exact"), wild.alias("wild"))

    cands = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(kmax))), cand
    )
    keys = (
        hosts.select("__h", F.explode(cands).alias("c"))
        .select(
            "__h",
            F.col("c.k").alias("k"),
            F.explode(F.array(F.col("c.exact"), F.col("c.wild"))).alias("key"),
        )
        .filter(F.col("key").isNotNull())
    )
    # prevailing rule: any exception beats all, else the longest match
    best = (
        keys.join(F.broadcast(_rules_df(spark)), "key")
        .groupBy("__h")
        .agg(F.max(F.struct(F.col("exc"), F.col("k"))).alias("b"))
        .select(
            "__h",
            F.when(F.col("b.exc"), F.col("b.k") - 1)
            .otherwise(F.col("b.k"))
            .alias("__ps"),
        )
    )
    lbl = F.split(F.col("__h"), r"\.")
    nn = F.size(lbl)
    tpd = (
        F.when(F.col("__h").rlike(DOTTED_ADDRESS), F.col("__h"))
        .when(F.col("__ps").isNull() | (nn <= F.col("__ps")), F.col("__h"))
        .otherwise(
            F.array_join(
                F.slice(lbl, nn - F.col("__ps"), F.col("__ps") + 1), "."
            )
        )
    )
    mapping = (
        hosts.join(best, "__h", "left").select("__h", tpd.alias(out_col))
    )
    return df.join(
        mapping, F.col(host_col).eqNullSafe(F.col("__h")), "left"
    ).drop("__h")
