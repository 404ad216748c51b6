"""Article → chunk splitting (pipeline ops L1-L4, SURVEY §2.l).

Reference semantics (reimplemented, not copied — behavior must match
bit-for-bit because chunk boundaries feed uids and golden tests):

- L3 sentence split: regex ``[.:;?!]``, strip, keep if len > threshold
  (reference utils.py:19-24).
- L4 greedy combine (reference utils.py:27-38): accumulate sentences
  while the accumulated length is < min_combination_len; once it
  reaches the target, emit the accumulated group joined with '.' and
  reset. Two documented quirks preserved exactly: the sentence that
  triggers the flush is NOT carried into the next group (it is
  dropped), and the trailing partial group is never emitted.
- L2 oversize split (reference crawler.py:94-102): texts shorter than
  max_len (1100) pass through; longer ones are split into sentences and
  recombined with min_combination_len = int(max_len / ceil(len/max_len))
  so pieces come out evenly sized.
- L1 article chunking (reference crawler.py:71-84): summary texts form
  section 0 with category 'summary'; each body section i (1-based)
  contributes its headline texts then its paragraph texts; ``position``
  is the global running index over the article's chunks.

The pure functions run per-article inside ``applyInPandas`` — the fold
is order-sensitive within one article but articles are independent, so
the operator scales linearly with article count (partition by article).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from math import ceil

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_PARAGRAPH_LEN = 1100  # reference crawler.py:14
_SENTENCE_RE = re.compile(r"[.:;?!]")

CATEGORY_SUMMARY = "summary"
CATEGORY_HEADLINE = "headline"
CATEGORY_PARAGRAPH = "paragraph"


# ---------------------------------------------------------------------------
# Pure functions (L2-L4)
# ---------------------------------------------------------------------------


def split_into_sentences(text: str, len_threshold: int = 1) -> list[str]:
    """L3: split on [.:;?!], strip, drop fragments ≤ threshold chars."""
    return [s.strip() for s in _SENTENCE_RE.split(text) if len(s.strip()) > len_threshold]


def combine_sentences(sentences: list[str], min_combination_len: int = 1000) -> list[str]:
    """L4: greedy accumulate-until-target, '.'-joined.

    Preserves the reference's exact behavior (utils.py:27-38): the
    flush-triggering sentence is dropped, and the trailing partial
    group is dropped.
    """
    group: list[str] = []
    combined: list[str] = []
    for sentence in sentences:
        if sum(len(s) for s in group) < min_combination_len:
            group.append(sentence)
        else:
            combined.append(".".join(group))
            group = []  # NOTE: `sentence` intentionally dropped (quirk)
    return combined  # NOTE: trailing `group` intentionally dropped (quirk)


def split_into_combined_sentence_chunks(
    text: str, min_combination_len: int = 1000, len_threshold: int = 1
) -> list[str]:
    return combine_sentences(
        split_into_sentences(text, len_threshold), min_combination_len
    )


def ensure_max_len(texts: list[str], max_len: int = MAX_PARAGRAPH_LEN) -> list[str]:
    """L2: pass short texts through; split oversize ones evenly."""
    out: list[str] = []
    for text in texts:
        if len(text) < max_len:
            out.append(text)
        else:
            min_combination_len = int(max_len / ceil(len(text) / max_len))
            out.extend(split_into_combined_sentence_chunks(text, min_combination_len))
    return out


def get_chunks_from_body(
    summary: list[str],
    sections: list[dict],
) -> list[dict]:
    """L1: article body → ordered chunk dicts (crawler.py:71-84).

    ``sections`` items are {'headline': [str], 'paragraphs': [str]}.
    Returns dicts with text/category/section/position.
    """
    chunks: list[dict] = [
        {"text": t, "category": CATEGORY_SUMMARY, "section": 0}
        for t in ensure_max_len(list(summary or []))
    ]
    for i, section in enumerate(sections or [], start=1):
        chunks.extend(
            {"text": t, "category": CATEGORY_HEADLINE, "section": i}
            for t in ensure_max_len(list(section.get("headline") or []))
        )
        chunks.extend(
            {"text": t, "category": CATEGORY_PARAGRAPH, "section": i}
            for t in ensure_max_len(list(section.get("paragraphs") or []))
        )
    for pos, chunk in enumerate(chunks):
        chunk["position"] = pos
    return chunks


# ---------------------------------------------------------------------------
# Spark operator (L1 over a DataFrame of raw articles)
# ---------------------------------------------------------------------------

CHUNK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("article_url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("section", T.IntegerType(), True),
        T.StructField("position", T.IntegerType(), True),
    ]
)


def chunk_articles(raw_articles: DataFrame) -> DataFrame:
    """Explode raw articles (FIXTURES.md raw_articles schema: url,
    summary array<string>, sections array<struct<headline,paragraphs>>)
    into chunk rows.

    Implemented with ``mapInPandas``: the per-article fold (greedy
    combine, per-article position counter) is order-sensitive only
    WITHIN one row's own arrays, so rows are independent — no shuffle,
    no per-key grouping, map-only linear scale-out.
    """
    cols = raw_articles.select("url", "summary", "sections")

    def _aslist(v) -> list:
        # Arrow hands array columns to pandas as numpy arrays; a bare
        # truthiness check on those raises — test for None explicitly
        return [] if v is None else list(v)

    def per_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = [f.name for f in CHUNK_OUT_SCHEMA.fields]
        for pdf in pdfs:
            rows: list[dict] = []
            for url, summary, secs in zip(
                pdf["url"], pdf["summary"], pdf["sections"]
            ):
                sections = [
                    {
                        "headline": _aslist(s["headline"]),
                        "paragraphs": _aslist(s["paragraphs"]),
                    }
                    for s in _aslist(secs)
                ]
                for c in get_chunks_from_body(_aslist(summary), sections):
                    rows.append(
                        {
                            "article_url": url,
                            "text": c["text"],
                            "category": c["category"],
                            "section": c["section"],
                            "position": c["position"],
                        }
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return cols.mapInPandas(per_batches, CHUNK_OUT_SCHEMA)
