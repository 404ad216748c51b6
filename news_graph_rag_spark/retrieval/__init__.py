"""Retrieval over the news graph: fuzzy fulltext entity linking (R1),
vector top-k (R2), hybrid fusion (R3), retrieval+graph expansion (R4)."""

from .fulltext import build_token_index, fuzzy_entity_candidates, lookup_entities  # noqa: F401
from .vector import cosine, vector_top_k  # noqa: F401
from .hybrid import hybrid_top_k, expand_chunk_hits, ppr_expand  # noqa: F401
