"""Round-12 catalog extensions.

ML training: multi-feature split finding (``tree_level_split_orders``
— the decision stump generalized to D features in one pass, proving
the "a full tree level fans out trivially" claim). Training-data
curation: deterministic epoch shuffle + shard manifest
(``epoch_shuffle_shards`` — the step between pack_sequences and a
trainer). Multimodal: integer bilinear image resize after a real BMP
decode (``multimodal_image_resize_stats`` — the vision twin of the
round-11 audio resample).

Appended as the LAST module in queries/__init__.py's pinned
``_ROUND_MODULES`` order (first-50 driver prefix + full-order
manifest both test-frozen).

Determinism per catalog.py's rules: integer outputs everywhere; the
one hash in the epoch shuffle is a two-round LCG mix in plain integer
arithmetic (portable to DuckDB, no overflow within BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load, register, spread

__all__: list[str] = []
