"""Text analysis operators: language ID, quality signals, token counts,
fingerprints — generic forms of the oracle-checked catalog queries.

All pure built-in-function column expressions (JVM-side, codegen'd):
no UDFs anywhere in this module, so every operator rides whole-stage
codegen and scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist"),
    "fr": ("le", "la", "les", "et", "de", "des", "un", "est"),
    "es": ("el", "la", "los", "y", "de", "las", "un", "es"),
}


def _stop_hits(text_col: F.Column, lang: str) -> F.Column:
    toks = F.split(F.lower(text_col), r"\s+")
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-vote language ID (n-gram heuristic family). Ties go to
    the earlier language in priority order de > fr > es > en."""
    t = F.col(text_col)
    de, en, fr, es = (_stop_hits(t, x) for x in ("de", "en", "fr", "es"))
    pred = (
        F.when((de > en) & (de > fr) & (de > es), "de")
        .when((fr > en) & (fr > es), "fr")
        .when(es > en, "es")
        .otherwise("en")
    )
    return df.withColumn(out_col, pred)


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append length / token / punctuation / uppercase / stopword-ratio
    signals plus a composite 0..1 quality score."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    toks = F.split(t, r"\s+")
    n_tokens = F.size(F.filter(toks, lambda x: x != "")).cast("bigint")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))).cast("bigint")
    n_upper = (n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))).cast("bigint")
    stop_hits = _stop_hits(t, "en").cast("bigint")
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(n_punct * 10 <= n_chars, 1.0).otherwise(0.0)
    stop_ok = F.when(stop_hits * 50 >= n_tokens, 1.0).otherwise(0.0)
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", n_punct)
        .withColumn("n_upper", n_upper)
        .withColumn("stop_hits", stop_hits)
        .withColumn("quality_score", (len_ok + punct_ok + stop_ok) / F.lit(3.0))
    )


def token_counts(
    df: DataFrame, text_col: str = "text", pattern: str = r"\W+"
) -> DataFrame:
    """Append a BPE-ish regex token count (word-boundary split)."""
    toks = F.split(F.col(text_col), pattern)
    return df.withColumn(
        "n_tokens", F.size(F.filter(toks, lambda t: t != "")).cast("bigint")
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append md5 fingerprint of whitespace-normalized lowercase text."""
    fp = F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", fp)
