"""L1-L4 chunking semantics — including the reference's two quirks
(flush-trigger sentence dropped; trailing partial group dropped,
utils.py:27-38) and the oversize split sizing (crawler.py:94-102)."""

from __future__ import annotations

from math import ceil

from news_graph_rag_spark.ingest.chunker import (
    MAX_PARAGRAPH_LEN,
    chunk_articles,
    combine_sentences,
    ensure_max_len,
    get_chunks_from_body,
    split_into_combined_sentence_chunks,
    split_into_sentences,
)

from fixtures import raw_articles_df, _LONG_PARA


def test_split_into_sentences_threshold():
    assert split_into_sentences("One two. Three! X? Four: and; five") == [
        "One two",
        "Three",
        "Four",
        "and",
        "five",
    ]
    # fragments of length <= threshold dropped ("X" has len 1)
    assert "X" not in split_into_sentences("Hello. X. World.")


def test_combine_sentences_flush_drops_trigger_and_remainder():
    # lengths: 4,4,4 with min=8: s1,s2 accumulate (4<8, 8>=8 at s3)
    # → flush "abcd.efgh", s3 DROPPED; remainder empty
    assert combine_sentences(["abcd", "efgh", "ijkl"], 8) == ["abcd.efgh"]
    # trailing partial group never emitted
    assert combine_sentences(["abcd", "efgh"], 100) == []
    assert combine_sentences([], 10) == []


def test_oversize_split_even_sizing():
    text = _LONG_PARA
    assert len(text) >= MAX_PARAGRAPH_LEN
    min_comb = int(MAX_PARAGRAPH_LEN / ceil(len(text) / MAX_PARAGRAPH_LEN))
    expected = split_into_combined_sentence_chunks(text, min_comb)
    assert ensure_max_len([text]) == expected
    # short texts pass through untouched
    assert ensure_max_len(["short one."]) == ["short one."]


def test_get_chunks_positions_and_sections():
    chunks = get_chunks_from_body(
        summary=["A summary."],
        sections=[
            {"headline": ["H1"], "paragraphs": ["P1", "P2"]},
            {"headline": [], "paragraphs": ["P3"]},
        ],
    )
    cats = [(c["category"], c["section"], c["position"]) for c in chunks]
    assert cats == [
        ("summary", 0, 0),
        ("headline", 1, 1),
        ("paragraph", 1, 2),
        ("paragraph", 1, 3),
        ("paragraph", 2, 4),
    ]


def test_chunk_articles_matches_pure_function(spark):
    raw = raw_articles_df(spark)
    out = chunk_articles(raw).collect()
    by_url: dict[str, list] = {}
    for r in out:
        by_url.setdefault(r["article_url"], []).append(r)
    for row in raw.collect():
        sections = [
            {"headline": list(s["headline"]), "paragraphs": list(s["paragraphs"])}
            for s in row["sections"]
        ]
        expected = get_chunks_from_body(list(row["summary"]), sections)
        got = sorted(by_url[row["url"]], key=lambda r: r["position"])
        assert [g["text"] for g in got] == [e["text"] for e in expected]
        assert [g["category"] for g in got] == [e["category"] for e in expected]
        assert [g["section"] for g in got] == [e["section"] for e in expected]
        assert [g["position"] for g in got] == [e["position"] for e in expected]
