"""Property-graph-on-DataFrames store.

Replaces the reference's Neo4j ``GraphDatabase`` wrapper (graph.py:16-240)
with typed node/edge DataFrames backed by parquet, registered as temp
views so LLM-generated Spark SQL (the analog of LLM-generated Cypher,
chat.py:47-66) runs directly against the graph.

Scale notes
-----------
- Node/edge tables are plain parquet directories → predicate pushdown and
  column pruning replace Neo4j's uid/name point-lookup indexes
  (graph.py:173-195). At 100 TB, partition ``chunk`` by a date or
  category column and let partition pruning take over (I2).
- Edge tables are (src_uid, dst_uid) pairs; multi-hop traversals are
  equi-join chains (SURVEY §2.c). Entity/source/topic dimension tables
  are small relative to chunks → broadcast them in joins.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EDGE_SCHEMAS, NATURAL_KEYS, NODE_SCHEMAS

ALL_TABLES = {**NODE_SCHEMAS, **EDGE_SCHEMAS}

# Node-label rendering for the LLM schema prompt (S6, chat.py:64
# ``db.graph.schema``): table name -> Cypher-style label.
_LABELS = {
    "article": "Article",
    "chunk": "Chunk",
    "person": "Person",
    "organization": "Organization",
    "location": "Location",
    "source": "Source",
    "topic": "Topic",
}
_EDGE_ENDPOINTS = {
    "contains": ("Article", "CONTAINS", "Chunk"),
    "mentions": ("Chunk", "MENTIONS", "Person|Organization|Location"),
    "authored": ("Person", "AUTHORED", "Article"),
    "has_topic": ("Article", "HAS_TOPIC", "Topic"),
    "published": ("Source", "PUBLISHED", "Article"),
}


def content_uid(label: str, *cols) -> F.Column:
    """Deterministic content-hash uid: ``'<Label>:' + sha2(...)[:12]``.

    The reference generates ``'<Label>:' + urlsafe_b64(uuid4())[:12]``
    (utils.py:10-11, config.py:5); we use a content hash of the natural
    key instead so ingestion is idempotent and goldens are stable
    (SURVEY §7 risks). Same shape: label prefix + 12 chars.
    """
    return F.concat(
        F.lit(label), F.lit(":"), F.substring(F.sha2(F.concat_ws("\x1f", *cols), 256), 1, 12)
    )


def random_uid(label: str) -> F.Column:
    """The reference's ORIGINAL uid scheme, behind its own function
    (SURVEY §7 "keep uuid mode behind a flag"): ``'<Label>:' +
    urlsafe_b64(uuid4())[:12]`` (reference utils.py:10-11). Per-row
    random via a uuid() expression re-encoded to the urlsafe-b64
    alphabet shape. NON-IDEMPOTENT by construction — re-ingesting the
    same article mints new nodes, which is why ``content_uid`` is the
    default; use this only to byte-match the reference's id format on
    a fresh one-shot load."""
    # uuid() yields hex-with-dashes; re-encode the 16 uuid bytes to
    # base64 and swap '+/' for '-_' — the urlsafe-b64 alphabet the
    # reference's token_urlsafe-style uid uses (A-Za-z0-9-_), so the 12
    # kept chars carry ~72 bits of entropy, matching the reference's
    # character set, not just its 'Label:12char' shape
    raw = F.expr("translate(base64(unhex(replace(uuid(), '-', ''))), '+/', '-_')")
    return F.concat(F.lit(label), F.lit(":"), F.substring(raw, 1, 12))


class GraphStore:
    """Typed node/edge DataFrames + view registration + schema rendering."""

    def __init__(self, spark: SparkSession, tables: dict[str, DataFrame] | None = None):
        self.spark = spark
        self.tables: dict[str, DataFrame] = dict(tables or {})

    # -- construction -----------------------------------------------------

    @classmethod
    def empty(cls, spark: SparkSession) -> "GraphStore":
        tables = {
            name: spark.createDataFrame([], schema) for name, schema in ALL_TABLES.items()
        }
        return cls(spark, tables)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "GraphStore":
        """Load every table that exists under ``root/<name>.parquet``."""
        store = cls.empty(spark)
        for name in ALL_TABLES:
            path = os.path.join(root, f"{name}.parquet")
            if os.path.exists(path):
                store.tables[name] = spark.read.parquet(path)
        return store

    def save(self, root: str, mode: str = "overwrite") -> None:
        for name, df in self.tables.items():
            df.write.mode(mode).parquet(os.path.join(root, f"{name}.parquet"))

    def save_atomic(self, root: str) -> None:
        """Write every table to a staging dir, then rename into place.

        Required when this store's DataFrames still lazily read from
        ``root`` (load → MERGE → save in a streaming micro-batch): a
        plain overwrite would delete the very files the unexecuted plan
        scans ("Cannot overwrite a path that is also being read from").
        Staging materializes each table BEFORE the live path is touched,
        at the same I/O cost as the save itself — no memory checkpoint
        of the whole store needed. The per-table swap is a rename; a
        crash mid-swap leaves a mixed store, but every writer is an
        idempotent content-hash MERGE, so the streaming checkpoint's
        batch replay converges to the same state.
        """
        staging = os.path.join(root, f"_staging_{uuid.uuid4().hex[:8]}")
        try:
            for name, df in self.tables.items():
                df.write.mode("overwrite").parquet(
                    os.path.join(staging, f"{name}.parquet")
                )
            for name in self.tables:
                final = os.path.join(root, f"{name}.parquet")
                if os.path.exists(final):
                    retired = os.path.join(staging, f"_old_{name}")
                    os.rename(final, retired)
                os.rename(os.path.join(staging, f"{name}.parquet"), final)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def localized(self) -> "GraphStore":
        """Return a new store whose tables are eagerly localCheckpointed.

        Cuts lineage and materializes every table NOW, so upstream
        caches (e.g. a crawl micro-batch's validated DataFrame) can be
        unpersisted without forcing recomputation later. Long ingest
        loops call this every N batches; production crawls interleave
        ``save()`` instead (parquet is the durable checkpoint — the
        foreachBatch streaming path already does).
        """
        return GraphStore(
            self.spark,
            {
                name: df.localCheckpoint(eager=True)
                for name, df in self.tables.items()
            },
        )

    # -- access -----------------------------------------------------------

    def __getitem__(self, name: str) -> DataFrame:
        return self.tables[name]

    def __setitem__(self, name: str, df: DataFrame) -> None:
        if name not in ALL_TABLES:
            raise KeyError(f"unknown graph table: {name}")
        self.tables[name] = df

    def register_views(self, prefix: str = "") -> None:
        """Register every table as a temp view — the SQL query surface."""
        for name, df in self.tables.items():
            df.createOrReplaceTempView(prefix + name)

    # -- S6: schema introspection (chat.py:64) ----------------------------

    def schema_string(self) -> str:
        """Render the graph schema for an LLM prompt.

        Analog of Neo4j's ``db.graph.schema`` used at chat.py:64: node
        labels with properties + relationship triples, but with Spark SQL
        types since generated queries target ``spark.sql``.
        """
        lines = ["Node tables:"]
        for name, label in _LABELS.items():
            df = self.tables.get(name)
            if df is None:
                continue
            cols = ", ".join(f"{f.name}: {f.dataType.simpleString()}" for f in df.schema)
            lines.append(f"  {name} (:{label}) {{{cols}}}")
        lines.append("Relationship tables (src_uid, dst_uid):")
        for name, (src, rel, dst) in _EDGE_ENDPOINTS.items():
            lines.append(f"  {name}: (:{src})-[:{rel}]->(:{dst})")
        return "\n".join(lines)

    # -- I1: uniqueness enforcement (graph.py:173-195) --------------------

    def assert_unique(self, table: str, keys: tuple[str, ...] | None = None) -> None:
        """Ingest-time stand-in for Neo4j uniqueness constraints."""
        keys = keys or NATURAL_KEYS[table]
        df = self.tables[table]
        total, distinct = df.select(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("d"),
        ).first()
        if total != distinct:
            raise ValueError(
                f"uniqueness violated on {table}{keys}: {total} rows, {distinct} distinct"
            )
