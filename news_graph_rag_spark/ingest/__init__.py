"""Ingestion: chunking (L1-L4), NER (L5-L6), embedding (L7), and the
MERGE-style idempotent upserts (D1-D8) that turn raw crawled articles
into the property-graph tables."""

from .chunker import (  # noqa: F401
    chunk_articles,
    combine_sentences,
    get_chunks_from_body,
    split_into_combined_sentence_chunks,
    split_into_sentences,
)
from .upserts import merge_into, ingest_articles  # noqa: F401
