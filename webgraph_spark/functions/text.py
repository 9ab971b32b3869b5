"""Text-analysis operators for a training-data pipeline over ``documents``.

No counterpart in the reference (it is a graph library; SURVEY §2.7 notes the
absence) — these are the corpus-hygiene operators a 100 TB ingest needs:
tokenization stats, quality scoring, language id, fingerprinting. Everything
is built from JVM-side column expressions (whole-stage codegen); no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for",
           "on", "with", "as", "at", "this", "but", "his", "her", "they"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
           "mit", "auf", "für", "von", "dem", "den", "sich", "auch"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une", "dans",
           "pour", "pas", "avec", "sur", "qui", "mais", "nous", "vous"],
    "es": ["el", "la", "los", "las", "y", "es", "que", "de", "una", "en",
           "por", "con", "para", "del", "se", "su", "como", "pero"],
}

# A BPE-ish word/punctuation segmentation: word pieces, numbers, or single
# non-space symbols — the usual pre-tokenizer regex family.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokenizer pieces (letter runs / digit runs /
    single symbols) — the usual pre-tokenizer segmentation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the quality-signal columns: n_chars_actual, n_tokens, avg_token_len,
    punct_ratio, digit_ratio, upper_ratio, stopword_ratio_en, quality_score."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))
    out = (
        df.withColumn("n_chars_actual", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            safe(
                F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast(
                    "double"
                ),
                n_tokens.cast("double"),
            ),
        )
        .withColumn("punct_ratio", safe(n_punct.cast("double"), n_chars.cast("double")))
        .withColumn("digit_ratio", safe(n_digit.cast("double"), n_chars.cast("double")))
        .withColumn("upper_ratio", safe(n_upper.cast("double"), n_chars.cast("double")))
        .withColumn(
            "stopword_ratio", safe(n_stop.cast("double"), n_tokens.cast("double"))
        )
    )
    # Simple monotone quality heuristic in [0, 1]: long-enough, word-like,
    # not symbol soup. Deterministic, order-free.
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", score)


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language id: argmax over per-language hit ratios,
    deterministic tie-break by language code; 'und' when nothing matches."""
    toks = tokens_col(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: sha256 of the whitespace-normalized, lowercased
    text — the canonical exact-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("fingerprint", F.sha2(norm, 256))
