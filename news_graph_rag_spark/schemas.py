"""Explicit Spark schemas for the news property graph.

The reference's schema is implicit — fixed by the CREATE/MERGE statements
in ``graph.py:29-129`` and the dataclasses in ``schema.py:17-38``. Here it
is made explicit as one StructType per node label and per relationship
type (the GraphFrames representation: node DataFrames + edge DataFrames).

Node labels  : Article, Chunk, Person, Organization, Location, Source, Topic
Relationships: CONTAINS, MENTIONS, AUTHORED, HAS_TOPIC, PUBLISHED
(reference graph.py:173-195 constraints; SURVEY §1.1 table)
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_SIZE = 768  # reference config.py:6
ENTITY_LABELS = ("Person", "Organization", "Location")  # reference config.py:4
CHUNK_CATEGORIES = ("summary", "headline", "paragraph")  # reference schema.py:11-14

# ---------------------------------------------------------------------------
# Node tables
# ---------------------------------------------------------------------------

ARTICLE = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("publishing_date", T.TimestampType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)  # reference graph.py:30-40

CHUNK = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("category", T.StringType(), True),  # summary|headline|paragraph
        T.StructField("section", T.IntegerType(), True),
        T.StructField("position", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),  # 768-d
    ]
)  # reference graph.py:50,118-129; schema.py:17-25

ENTITY = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)  # Person / Organization / Location; reference graph.py:87-89,113

SOURCE = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)  # reference graph.py:74-75

TOPIC = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)  # reference graph.py:66-68

NODE_SCHEMAS: dict[str, T.StructType] = {
    "article": ARTICLE,
    "chunk": CHUNK,
    "person": ENTITY,
    "organization": ENTITY,
    "location": ENTITY,
    "source": SOURCE,
    "topic": TOPIC,
}

# ---------------------------------------------------------------------------
# Edge tables — (src_uid, dst_uid) per relationship type (SURVEY §1.3).
# MENTIONS carries the entity label so one table serves all three entity
# node tables (the reference string-substitutes the label into its query,
# graph.py:112-113; we keep a column instead — single set-oriented pass).
# ---------------------------------------------------------------------------


def _edge(*extra: T.StructField) -> T.StructType:
    return T.StructType(
        [
            T.StructField("src_uid", T.StringType(), False),
            T.StructField("dst_uid", T.StringType(), False),
            *extra,
        ]
    )


CONTAINS = _edge()  # Article -> Chunk        (graph.py:51)
MENTIONS = _edge(T.StructField("entity_label", T.StringType(), False))
# Chunk -> Person|Organization|Location       (graph.py:92,113)
AUTHORED = _edge()  # Person -> Article       (graph.py:62-64, reverse=True)
HAS_TOPIC = _edge()  # Article -> Topic       (graph.py:66-68)
PUBLISHED = _edge()  # Source -> Article      (graph.py:76)

EDGE_SCHEMAS: dict[str, T.StructType] = {
    "contains": CONTAINS,
    "mentions": MENTIONS,
    "authored": AUTHORED,
    "has_topic": HAS_TOPIC,
    "published": PUBLISHED,
}

# Natural (MERGE) keys per table — what Cypher MERGE patterns key on
# (SURVEY §2.d): nodes by uid or name; edges by the full endpoint pair.
NATURAL_KEYS: dict[str, tuple[str, ...]] = {
    "article": ("uid",),
    "chunk": ("uid",),
    "person": ("name",),  # graph.py:87-89 MERGE by name
    "organization": ("name",),
    "location": ("name",),
    "source": ("name", "type", "url"),  # graph.py:74-75
    "topic": ("name",),
    "contains": ("src_uid", "dst_uid"),
    "mentions": ("src_uid", "dst_uid"),
    "authored": ("src_uid", "dst_uid"),
    "has_topic": ("src_uid", "dst_uid"),
    "published": ("src_uid", "dst_uid"),
}
