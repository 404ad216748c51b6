"""S5 error-sink + S1 file sources: row-level quarantine replacing the
reference's per-article try/except driver loop (crawler.py:23-50, L9),
and file-format readers for crawler dumps.

The reference catches exceptions per article and appends the failure to
``error_log.log`` (crawler.py:48-50). Set-oriented equivalent: validate
the whole batch declaratively, split it into (valid, rejected-with-
reason), ingest the valid side, persist the rejected side as a
``_rejected`` table. No control flow, no driver loop — at 100 TB a bad
record costs one predicate, not an exception unwind.

Sources: the crawler's fundus stream becomes "whatever file the crawl
dumped" — JSONL (one article per line) and parquet readers with the
same explicit schema, so malformed records surface as nulls that the
validator quarantines (PERMISSIVE mode + columnNameOfCorruptRecord),
never as job failures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# validation rules: (reason, predicate-that-flags-a-BAD-row)
_RULES: list[tuple[str, F.Column]] = []


def _rules() -> list[tuple[str, F.Column]]:
    return [
        ("missing_url", F.col("url").isNull() | (F.length("url") == 0)),
        ("missing_title", F.col("title").isNull()),
        (
            "no_content",
            (F.coalesce(F.size("summary"), F.lit(0)) == 0)
            & (F.coalesce(F.size("sections"), F.lit(0)) == 0),
        ),
        (
            "bad_language",
            F.col("language").isNotNull() & (F.length("language") != 2),
        ),
    ]


def validate_raw_articles(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a raw-articles batch into (valid, rejected).

    ``rejected`` carries a ``reject_reasons`` array naming every failed
    rule — the set-oriented analog of the reference's error log line.
    """
    reasons = F.array_compact(
        F.array(
            *[F.when(pred, F.lit(reason)) for reason, pred in _rules()]
        )
    )
    flagged = raw.withColumn("reject_reasons", reasons)
    valid = flagged.filter(F.size("reject_reasons") == 0).drop("reject_reasons")
    rejected = flagged.filter(F.size("reject_reasons") > 0)
    return valid, rejected


def write_rejected(rejected: DataFrame, root: str) -> None:
    """Persist quarantined rows (S5 sink): append-mode parquet so every
    ingest batch's failures accumulate, queryable like any table."""
    rejected.withColumn("rejected_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(f"{root}/_rejected")


def read_raw_articles_jsonl(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """S1: read a crawler dump (JSON lines, one article per line) with
    the explicit raw-articles schema. Corrupt lines are kept PERMISSIVE
    instead of failing the job; their required fields arrive null, so
    the validator quarantines them."""
    return (
        spark.read.schema(schema or _raw_schema())
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .json(path)
    )


def _raw_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("title", T.StringType(), True),
            T.StructField("publishing_date", T.TimestampType(), True),
            T.StructField("language", T.StringType(), True),
            T.StructField("summary", T.ArrayType(T.StringType()), True),
            T.StructField(
                "sections",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "headline", T.ArrayType(T.StringType()), True
                            ),
                            T.StructField(
                                "paragraphs", T.ArrayType(T.StringType()), True
                            ),
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
