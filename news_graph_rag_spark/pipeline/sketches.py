"""Shared expression builders for the portable (cross-engine
value-parity) sketches. The batch catalog entry
(``queries/python_ops.hll_registers_users``) and the streaming
maintainer (``streaming/ingest_stream.streaming_hll_registers``)
promise BIT-IDENTICAL register states — so the md5/register/rho
expression pipeline lives HERE, once, and both import it (round-8
review: two verbatim copies would silently drift apart and break the
parity claim plus the DuckDB hash verification).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_REGISTER_BITS = 8  # 2^8 = 256 registers
HLL_RANK_BITS = 48  # remaining md5 bits ranked for rho


def hll_hash(id_col: Column) -> Column:
    """Top 56 bits of md5(id) as a BIGINT — identical hex and
    identical conv/CAST parsing in Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 14), 16, 10
    ).cast("long")


def hll_register_rows(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """(key, register_idx, rho) per observation — the pre-aggregation
    rows whose per-(key, register) MAX is the HLL state. NULL ids drop
    (md5(NULL) is NULL in both engines and the oracle mirrors the
    filter)."""
    h = hll_hash(F.col(id_col))
    w = F.col("h").bitwiseAND(F.lit((1 << HLL_RANK_BITS) - 1))
    rho = (
        F.when(w == 0, F.lit(HLL_RANK_BITS + 1))
        .otherwise(F.lit(HLL_RANK_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(key_col).alias("key"), h.alias("h"))
        .select(
            "key",
            F.shiftright(F.col("h"), HLL_RANK_BITS).cast("int").alias(
                "register_idx"
            ),
            rho.alias("rho"),
        )
    )


def hll_registers(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """The mergeable register state: groupBy MAX over the rows — works
    identically as a batch or streaming aggregation."""
    return (
        hll_register_rows(df, key_col, id_col)
        .groupBy("key", "register_idx")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )
