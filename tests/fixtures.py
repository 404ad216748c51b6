"""Deterministic news-corpus fixture (FIXTURES.md family A, raw-ingest
shape) used by ingest/retrieval/llm tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

RAW_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("publishing_date", T.TimestampType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("summary", T.ArrayType(T.StringType()), True),
        T.StructField(
            "sections",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("headline", T.ArrayType(T.StringType()), True),
                        T.StructField("paragraphs", T.ArrayType(T.StringType()), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("topics", T.ArrayType(T.StringType()), True),
        T.StructField("authors", T.ArrayType(T.StringType()), True),
        T.StructField("source_name", T.StringType(), True),
        T.StructField("source_type", T.StringType(), True),
        T.StructField("source_url", T.StringType(), True),
    ]
)

# entity names used by the gazetteer NER model and fuzzy-link tests
PEOPLE = ["Ursula von der Leyen", "Emmanuel Macron", "Olaf Scholz"]
ORGS = ["European Union", "BRICS", "NATO"]
LOCATIONS = ["France", "Berlin", "Ankara"]

GAZETTEER = {
    "person": PEOPLE,
    "organization": ORGS,
    "location": LOCATIONS,
}

_LONG_PARA = (
    "Ursula von der Leyen spoke about the European Union budget. "
    "The address covered climate policy and enlargement. "
    "Emmanuel Macron responded from France with his own proposal. "
    "Olaf Scholz remained silent in Berlin during the debate. "
) * 8  # > 1100 chars → exercises the oversize splitter + greedy combiner


def ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 5, day, 12, 0, 0)


RAW_ROWS = [
    {
        "url": "https://news.example/a1",
        "title": "EU summit: von der Leyen outlines budget",
        "publishing_date": ts(1),
        "language": "en",
        "summary": ["Ursula von der Leyen outlined the European Union budget."],
        "sections": [
            {
                "headline": ["Budget battle"],
                "paragraphs": [
                    "Ursula von der Leyen presented the plan to the European Union parliament.",
                    _LONG_PARA,
                ],
            },
            {
                "headline": ["Reactions"],
                "paragraphs": [
                    "Emmanuel Macron welcomed the plan in France.",
                ],
            },
        ],
        "topics": ["politics", "economy"],
        "authors": ["Alice Writer", "Bob Reporter"],
        "source_name": "Example News",
        "source_type": "news",
        "source_url": "https://news.example",
    },
    {
        "url": "https://news.example/a2",
        "title": "BRICS expansion and Ankara's position",
        "publishing_date": ts(2),
        "language": "en",
        "summary": ["BRICS considers new members as Ankara watches."],
        "sections": [
            {
                "headline": ["A widening bloc"],
                "paragraphs": [
                    "BRICS has grown; NATO members watch Ankara closely.",
                    "Olaf Scholz commented from Berlin.",
                ],
            }
        ],
        "topics": ["politics"],
        "authors": [],  # author fallback path (crawler.py:44)
        "source_name": "World Wire",
        "source_type": "agency",
        "source_url": "https://world.wire",
    },
    {
        "url": "https://news.example/a3",
        "title": "France and Macron: a profile",
        "publishing_date": ts(3),
        "language": "en",
        "summary": [],
        "sections": [
            {
                "headline": [],
                "paragraphs": [
                    "Emmanuel Macron governs France.",
                    "The European Union remains central to his agenda.",
                ],
            }
        ],
        "topics": [],
        "authors": ["Alice Writer"],
        "source_name": "Example News",
        "source_type": "news",
        "source_url": "https://news.example",
    },
]


def raw_articles_df(spark):
    return spark.createDataFrame(RAW_ROWS, RAW_SCHEMA)
