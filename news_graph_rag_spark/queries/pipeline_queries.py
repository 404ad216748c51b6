"""Training-data pipeline catalog: deduplication + text analysis over the
``documents`` table (the capabilities a 100 TB pretraining-data pipeline
needs, built on the same engine).

Portability notes for the DuckDB oracle:
- The shared hash primitive is ``md5`` (identical hex output in both
  engines). MinHash takes lexicographic minima of salted md5 hex strings;
  SimHash derives a 32-bit integer via hex→int conversion
  (Spark ``conv(hex,16,10)``, DuckDB ``('0x'||hex)::BIGINT``).
- Ratio thresholds use cross-multiplied integer comparisons (exact).

Scale notes:
- Exact dedup: one shuffle on the content hash; partial aggregation
  applies. At 100 TB hash first (64-bit prefix) so the shuffle carries
  16 bytes per row, not the document text.
- MinHash-LSH: signatures are computed map-side (min over the per-row
  shingle array — no explode, no shuffle), then one small shuffle groups
  8 rows/doc into band hashes and another groups bucket members; pairs
  are emitted per bucket, so bucket size bounds the quadratic blowup
  (r=2 rows/band keeps false-positive buckets rare; a per-bucket cap
  would be added for adversarial data).
- Pairwise n-gram Jaccard is quadratic → only ever run it inside LSH
  buckets or on a bounded candidate subset (here: doc_id bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load, register, spread

# the ONE whitespace class for content normalization, written out
# explicitly because Java regex \\s includes vertical tab while
# DuckDB's RE2 \\s does not — a latent cross-engine md5 divergence
# the moment a corpus carries \\x0b (round-8 review)
_WS_CLASS = r"[ \t\n\r\f\x0b]+"

NUM_MINHASHES = 8
BAND_ROWS = 2  # r=2, b=4

# ---------------------------------------------------------------------------
# Exact deduplication — hash-groupBy on normalized content
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g'))
             AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="dedup: exact content-hash groupBy, min-id canonical",
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    norm = F.regexp_replace(F.lower(F.col("text")), _WS_CLASS, " ")
    return (
        docs.select(F.md5(norm).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling helper (3-word shingles) — shared by MinHash + Jaccard
# ---------------------------------------------------------------------------


def shingles_df(spark: SparkSession, sf: str, max_doc_id: int | None = None) -> DataFrame:
    """(doc_id, shingle) distinct 3-word shingles per document."""
    docs = spread(load(spark, sf, "documents"))
    if max_doc_id is not None:
        docs = docs.filter(F.col("doc_id") < max_doc_id)
    toks = F.split(F.col("text"), " ")
    # 1-based window start i ∈ [1, size-2]; 3 consecutive tokens per shingle
    sh = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array(F.col("text")))
    return docs.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def shingle_array(text_col: F.Column) -> F.Column:
    """3-word shingle ARRAY per row (map-side only, no explode)."""
    toks = F.split(text_col, " ")
    return F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array(text_col))


_SHINGLE_ARR_SQL = """
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN [array_to_string(toks[i:i+2], ' ')
                        FOR i IN range(1, len(toks) - 1)]
                  ELSE [text] END AS shs
      FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
            FROM documents {where})
"""

_SHINGLE_SQL = f"""
    SELECT DISTINCT doc_id, shingle
    FROM ({_SHINGLE_ARR_SQL}) t, unnest(t.shs) AS u(shingle)
"""


def _shingle_rows_kernel(batches):
    """Arrow kernel: (doc_id, text) → per-doc DISTINCT 3-word shingles,
    one row each — the map-side equivalent of
    ``explode(array_distinct(shingle_array(text)))``. Same semantics as
    the Catalyst form (split(' ') keeps empty tokens; <3-token docs
    yield the whole text as their single shingle); NULL text emits
    nothing, equivalent because a NULL shingle can never equi-join or
    group with anything downstream. Exists for the same reason as the
    minhash kernel: the nested transform/sequence HOF is interpreted
    (never codegen'd) and allocation-heavy — on long-text corpora the
    per-element dispatch plus garbage churn dominates and destabilizes
    co-resident queries; one vectorized pass is flat and allocation-
    light. Used by decontaminate_train_test (both split sides)."""
    import pandas as pd

    for pdf in batches:
        ids: list[int] = []
        vals: list[str] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if not isinstance(text, str):
                continue
            toks = text.split(" ")
            if len(toks) >= 3:
                shs = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
            else:
                shs = {text}
            ids.extend([doc_id] * len(shs))
            vals.extend(shs)
        yield pd.DataFrame({"doc_id": ids, "shingle": vals})


def _minhash_kernel(num_hashes: int, band_rows: int | None = None):
    """Arrow kernel computing MinHash signatures per document in one
    map-side pass — or, with ``band_rows`` set, the banded LSH keys
    directly (md5 of the '|'-joined per-band minhashes, seed order),
    skipping the (doc_id, seed) -> (doc_id, band) shuffle entirely.

    Byte-identical to the oracle's
    ``list_min([md5(s || '#' || seed) FOR s IN shingles])``: same 3-word
    shingles (split(' ') keeps empty tokens in both engines), same salt,
    same lexicographic hex min. The previous Catalyst form
    (crossJoin(seeds) + array_min(transform(md5...))) was a nested HOF —
    interpreted, never codegen'd — and re-evaluated the shingle
    transform per seed after projection collapse: ~8 x 48 interpreted
    dispatches per document dominated the sf0.1 bench (the known HOF
    interpretation cliff; the Arrow form measured ~4x faster end-to-end
    on dedup_minhash_lsh_pairs). NULL text yields NULL signatures /
    band keys, matching both engines' null propagation."""

    def run(batches):
        import hashlib

        import pandas as pd

        salts = [f"#{s}".encode() for s in range(num_hashes)]
        for pdf in batches:
            ids: list[int] = []
            keys: list[int] = []
            vals: list[str | None] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if isinstance(text, str):
                    toks = text.split(" ")
                    if len(toks) >= 3:
                        shs = [
                            " ".join(toks[i : i + 3]).encode()
                            for i in range(len(toks) - 2)
                        ]
                    else:
                        shs = [text.encode()]
                    mins: list[str | None] = [
                        min(hashlib.md5(s + salt).hexdigest() for s in shs)
                        for salt in salts
                    ]
                else:
                    mins = [None] * num_hashes
                if band_rows is None:
                    for seed, mh in enumerate(mins):
                        ids.append(doc_id)
                        keys.append(seed)
                        vals.append(mh)
                else:
                    for band in range(num_hashes // band_rows):
                        chunk = mins[band * band_rows : (band + 1) * band_rows]
                        bh = (
                            hashlib.md5("|".join(chunk).encode()).hexdigest()
                            if None not in chunk
                            else None
                        )
                        ids.append(doc_id)
                        keys.append(band)
                        vals.append(bh)
            kcol, vcol = (
                ("seed", "minhash") if band_rows is None else ("band", "band_hash")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    kcol: pd.Series(keys, dtype="int32"),
                    vcol: vals,
                }
            )

    return run


@register(
    "dedup_minhash_signature",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    seeds AS (SELECT unnest(range(0, {NUM_MINHASHES})) AS seed)
    SELECT doc_id, CAST(seed AS INT) AS seed,
           list_min([md5(s || '#' || CAST(seed AS VARCHAR)) FOR s IN shs])
             AS minhash
    FROM shdocs CROSS JOIN seeds
    """,
    doc="dedup: MinHash signatures (8 salted-md5 minima over 3-shingles); "
    "map-side only — min over the shingle array, no explode/shuffle",
)
def dedup_minhash_signature(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    return docs.select("doc_id", "text").mapInPandas(
        _minhash_kernel(NUM_MINHASHES),
        "doc_id long, seed int, minhash string",
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    seeds AS (SELECT unnest(range(0, {NUM_MINHASHES})) AS seed),
    sig AS (
      SELECT doc_id, seed,
             list_min([md5(s || '#' || CAST(seed AS VARCHAR)) FOR s IN shs])
               AS minhash
      FROM shdocs CROSS JOIN seeds
    ),
    bands AS (
      SELECT doc_id, CAST(seed // {BAND_ROWS} AS INT) AS band,
             md5(string_agg(minhash, '|' ORDER BY seed)) AS band_hash
      FROM sig GROUP BY doc_id, seed // {BAND_ROWS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
    doc="dedup: MinHash-LSH candidate pairs (b=4 bands, r=2 rows); "
    "signatures map-side; pairs emitted per bucket (no self-join, so the "
    "signature subtree is evaluated once and bucket size bounds the blowup)",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # band keys come straight out of the Arrow kernel (seed order is the
    # kernel's iteration order, so the '|'-join matches the oracle's
    # string_agg(minhash, '|' ORDER BY seed) byte-for-byte) — banding is
    # map-side and the ONLY shuffle left in the candidate plan is the
    # bucket groupBy on (band, band_hash)
    docs = spread(load(spark, sf, "documents"))
    bands = docs.select("doc_id", "text").mapInPandas(
        _minhash_kernel(NUM_MINHASHES, band_rows=BAND_ROWS),
        "doc_id long, band int, band_hash string",
    ).filter(F.col("band_hash").isNotNull())
    # ^ NULL-text docs get NULL band keys; the oracle's equi-join never
    # matches NULL, but groupBy would bucket them together and emit
    # pairs the oracle doesn't (same guard decontaminate_fuzzy_lsh
    # carries; latent until the testdata contains NULL text)
    # bucket members → all ordered pairs within the bucket; members are
    # sorted so doc_a < doc_b by construction
    buckets = (
        bands.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("members") - 2),
            lambda i: F.transform(
                F.slice(F.col("members"), i + 2, F.size("members")),
                lambda m: F.struct(
                    F.element_at(F.col("members"), i + 1).alias("doc_a"),
                    m.alias("doc_b"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (bounded candidate subset; exact integer filter)
# ---------------------------------------------------------------------------

_JACCARD_BOUND = 500


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingles AS ({_SHINGLE_SQL.format(where=f"WHERE doc_id < {_JACCARD_BOUND}")}),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM shingles GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_shared, sa.sz AS size_a, sb.sz AS size_b
    FROM shared
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_shared * 10 >= (sa.sz + sb.sz - n_shared)
    """,
    doc="dedup: pairwise 3-gram Jaccard >= 0.1 on bounded subset (exact int filter)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    sh = shingles_df(spark, sf, max_doc_id=_JACCARD_BOUND)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
        .filter(F.col("n_shared") * 10 >= (F.col("size_a") + F.col("size_b") - F.col("n_shared")))
        .select("doc_a", "doc_b", "n_shared", "size_a", "size_b")
    )


# ---------------------------------------------------------------------------
# SimHash fingerprint — 32-bit, md5-derived per-token hashes, bit votes
# ---------------------------------------------------------------------------


@register(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents) t
      WHERE token <> ''
      GROUP BY doc_id, token
    ),
    bits AS (
      SELECT doc_id, w,
             ('0x' || substr(md5(token), 1, 8))::BIGINT AS h,
             unnest(range(0, 32)) AS bit
      FROM toks
    ),
    votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h >> bit) & 1 = 1 THEN w ELSE -w END) AS vote
      FROM bits GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    doc="dedup: 32-bit SimHash fingerprint (weighted bit votes, md5-derived)",
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint")
    bits = toks.withColumn("h", h).select(
        "doc_id", "w", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
    )
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("(shiftright(h, bit) & 1) = 1"), F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias("vote")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(cast(1 as bigint), bit)"))
            .otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )


# ---------------------------------------------------------------------------
# Text analysis: language ID, quality score, token count, fingerprint
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "les", "et", "de"),
    "es": ("el", "la", "los", "y", "de"),
}


def _stop_count(lang: str) -> F.Column:
    toks = F.split(F.lower(F.col("text")), " ")
    arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _stop_count_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '),"
        f" t -> list_contains([{words}], t)))"
    )


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
      CASE
        WHEN {_stop_count_sql('de')} > {_stop_count_sql('en')}
         AND {_stop_count_sql('de')} > {_stop_count_sql('fr')}
         AND {_stop_count_sql('de')} > {_stop_count_sql('es')} THEN 'de'
        WHEN {_stop_count_sql('fr')} > {_stop_count_sql('en')}
         AND {_stop_count_sql('fr')} > {_stop_count_sql('es')} THEN 'fr'
        WHEN {_stop_count_sql('es')} > {_stop_count_sql('en')} THEN 'es'
        ELSE 'en'
      END AS pred_lang
    FROM documents
    """,
    doc="text: n-gram/stopword-heuristic language ID",
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    de, en, fr, es = (_stop_count(x) for x in ("de", "en", "fr", "es"))
    pred = (
        F.when((de > en) & (de > fr) & (de > es), "de")
        .when((fr > en) & (fr > es), "fr")
        .when(es > en, "es")
        .otherwise("en")
    )
    return docs.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
             AS n_punct,
           CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
             AS len_ok
    FROM documents
    """,
    doc="text: quality signals — length, tokens, punctuation, length gate",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    n_chars = F.length(F.col("text")).cast("bigint")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        F.size(F.filter(toks, lambda t: t != "")).cast("bigint").alias("n_tokens"),
        (n_chars - F.length(F.regexp_replace(F.col("text"), "[.,;:!?]", ""))).alias(
            "n_punct"
        ),
        F.when((n_chars >= 100) & (n_chars <= 2000), 1).otherwise(0).cast("int").alias("len_ok"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT lang,
           CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\W+'),
                                    t -> t <> ''))) AS BIGINT) AS total_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
    doc="text: regex (BPE-ish word-boundary) token counting per language",
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), r"\W+")
    n = F.size(F.filter(toks, lambda t: t != "")).cast("bigint")
    return docs.groupBy("lang").agg(
        F.sum(n).cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g'))
             AS fingerprint,
           substr(md5(regexp_replace(lower(text), '[ \t\n\r\f\x0b]+', ' ', 'g')), 1, 8)
             AS fp_prefix
    FROM documents
    """,
    doc="text: normalized content fingerprint (md5 of whitespace-collapsed)",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), _WS_CLASS, " "))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("fp_prefix")
    )


# ---------------------------------------------------------------------------
# End-to-end near-dup canonicalization:
# LSH candidates -> exact Jaccard verify -> connected components -> canon
# ---------------------------------------------------------------------------


@register(
    "dedup_canonicalize",
    oracle=f"""
    WITH RECURSIVE shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    seeds AS (SELECT unnest(range(0, {NUM_MINHASHES})) AS seed),
    sig AS (
      SELECT doc_id, seed,
             list_min([md5(s || '#' || CAST(seed AS VARCHAR)) FOR s IN shs])
               AS minhash
      FROM shdocs CROSS JOIN seeds
    ),
    bands AS (
      SELECT doc_id, CAST(seed // {BAND_ROWS} AS INT) AS band,
             md5(string_agg(minhash, '|' ORDER BY seed)) AS band_hash
      FROM sig GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    shingles AS (
      SELECT DISTINCT doc_id, u.shingle
      FROM shdocs, unnest(shdocs.shs) AS u(shingle)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM shingles GROUP BY doc_id),
    shared AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
      FROM cand c
      JOIN shingles a ON a.doc_id = c.doc_a
      JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    verified AS (
      SELECT doc_a, doc_b
      FROM shared
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_shared * 10 >= 3 * (sa.sz + sb.sz - n_shared)
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b, doc_a FROM verified
    ),
    reach(id, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(least(id, min(r)) AS BIGINT) AS canonical_id
    FROM reach GROUP BY id
    """,
    doc="dedup, end to end: MinHash-LSH candidate pairs -> exact 3-gram "
    "Jaccard >= 0.3 verification (cross-multiplied int compare) -> "
    "connected components over verified pairs -> canonical id = "
    "component-min doc_id. The full 100 TB near-dup canonicalization "
    "pipeline, value-exact vs a composed recursive-CTE DuckDB oracle. "
    "Candidates bound the quadratic verify; CC runs to convergence.",
)
def dedup_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import connected_components

    # Materialize the (tiny, bucket-capped) candidate set once — it feeds
    # both the id prefilter and the verify join, and its LSH lineage is
    # far too expensive to recompute per consumer.
    pairs = dedup_minhash_lsh_pairs(spark, sf).localCheckpoint(eager=True)
    # Jaccard verify on shingle ARRAYS, computed ONLY for docs that
    # appear in some candidate pair: a broadcast semi-join prunes the
    # corpus before the (expensive) shingle transform runs, the pruned
    # per-doc arrays are small enough to broadcast into both pair joins,
    # and the intersection is a per-pair JVM array op — no explode, no
    # shuffle of a corpus-wide (doc, shingle) table (the previous
    # explode + double-join shuffled every such row twice).
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs = spread(load(spark, sf, "documents"))
    sharr = (
        docs.join(F.broadcast(cand_ids), "doc_id")
        .select("doc_id", F.array_distinct(shingle_array(F.col("text"))).alias("shs"))
        # the frame feeds TWO broadcasts whose plans differ only by
        # doc_a/doc_b aliasing, which defeats exchange reuse — pin it
        # once so the shingling scan doesn't run per join side
        # (round-8 review; same treatment `pairs` gets)
        .localCheckpoint(eager=True)
    )
    verified = (
        pairs.join(
            F.broadcast(
                sharr.select(
                    F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a")
                )
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sharr.select(
                    F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b")
                )
            ),
            "doc_b",
        )
        .withColumn("n_shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("size_a", F.size("sh_a"))
        .withColumn("size_b", F.size("sh_b"))
        .filter(
            F.col("n_shared") * 10
            >= 3 * (F.col("size_a") + F.col("size_b") - F.col("n_shared"))
        )
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    cc = connected_components(verified)
    return cc.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("canonical_id"),
    )


# ---------------------------------------------------------------------------
# BM25 keyword scoring — the Lucene-relevance analog over documents
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_keyword_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    tf AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN token = '{_BM25_TERMS[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
             CAST(sum(CASE WHEN token = '{_BM25_TERMS[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
             CAST(sum(CASE WHEN token = '{_BM25_TERMS[2]}' THEN 1 ELSE 0 END) AS BIGINT) AS tf2
      FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      FROM tf
    ),
    avg_dl AS (
      SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl
    ),
    scored AS (
      SELECT t.doc_id, t.tf0, t.tf1, t.tf2,
        (CASE WHEN t.tf0 > 0 THEN ln((CAST(s.n - s.df0 AS DOUBLE) + 0.5) / (CAST(s.df0 AS DOUBLE) + 0.5) + 1.0)
              * ({_BM25_K1} + 1.0) * CAST(t.tf0 AS DOUBLE)
              / (CAST(t.tf0 AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * (CAST(d.dl AS DOUBLE) / a.avgdl)))
              ELSE 0.0 END)
        + (CASE WHEN t.tf1 > 0 THEN ln((CAST(s.n - s.df1 AS DOUBLE) + 0.5) / (CAST(s.df1 AS DOUBLE) + 0.5) + 1.0)
              * ({_BM25_K1} + 1.0) * CAST(t.tf1 AS DOUBLE)
              / (CAST(t.tf1 AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * (CAST(d.dl AS DOUBLE) / a.avgdl)))
              ELSE 0.0 END)
        + (CASE WHEN t.tf2 > 0 THEN ln((CAST(s.n - s.df2 AS DOUBLE) + 0.5) / (CAST(s.df2 AS DOUBLE) + 0.5) + 1.0)
              * ({_BM25_K1} + 1.0) * CAST(t.tf2 AS DOUBLE)
              / (CAST(t.tf2 AS DOUBLE) + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * (CAST(d.dl AS DOUBLE) / a.avgdl)))
              ELSE 0.0 END) AS score
      FROM tf t JOIN dl d USING (doc_id) CROSS JOIN stats s CROSS JOIN avg_dl a
    )
    SELECT doc_id, tf0, tf1, tf2,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= 15
    """,
    doc="fulltext relevance: BM25 (k1=1.2, b=0.75) over the documents "
    "corpus for a fixed 3-term query — the scalable analog of the "
    "reference's Lucene-scored fulltext index (graph.py:196-209). "
    "tf/df/dl are exact ints; the float score is a FIXED-ORDER "
    "expression (term0+term1+term2), identical in both engines, and "
    "only ranks are emitted. Corpus stats (N, df, avgdl) are a 1-row "
    "broadcast; scoring is map-side; top-k is TakeOrdered.",
)
def bm25_keyword_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import top_k_ranked

    docs = spread(load(spark, sf, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    # one groupBy carries doc length AND per-term tfs: the token stream
    # is scanned and shuffled once, not once per derived stat
    tf = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    # ONE 1-row global-stats broadcast (round-18): n/df and avgdl were
    # two separate tf.agg broadcasts, and each broadcast build is its
    # own job that re-runs tokenize + the per-doc aggregation end to
    # end (exchange reuse never crosses a broadcast build's job
    # boundary) — the token stream was scanned three times per call.
    # avgdl = sum(dl)/n computed from the same row is bit-identical
    # (exact integer sum, then one double divide).
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )

    def term(i: int) -> F.Column:
        tf_d = F.col(f"tf{i}").cast("double")
        df_d = F.col(f"df{i}").cast("double")
        idf = F.log((F.col("n").cast("double") - df_d + 0.5) / (df_d + 0.5) + 1.0)
        denom = tf_d + _BM25_K1 * (
            1.0 - _BM25_B + _BM25_B * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        return F.when(
            F.col(f"tf{i}") > 0, idf * (_BM25_K1 + 1.0) * tf_d / denom
        ).otherwise(F.lit(0.0))

    # fixed-order sum (term0 + term1 + term2): bit-reproducible, unlike
    # an aggregation whose addition order floats with partitioning
    scored = tf.crossJoin(F.broadcast(stats)).withColumn(
        "score", term(0) + term(1) + term(2)
    )
    return top_k_ranked(scored, [F.desc("score"), F.asc("doc_id")], 15).select(
        "doc_id", "tf0", "tf1", "tf2", "rnk"
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split — reproducible hash bucketing
# ---------------------------------------------------------------------------


@register(
    "train_val_test_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="training-pipeline utility: deterministic 12/2/2-of-16 "
    "train/val/test assignment from the first hex digit of md5(doc_id). "
    "Pure map — zero shuffle at any scale — and stable under re-runs "
    "and data re-partitioning (unlike rand()-based splits).",
)
def train_val_test_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.select(
        "doc_id",
        F.when(h <= "b", "train").when(h <= "d", "val").otherwise("test").alias(
            "split"
        ),
    )


# ---------------------------------------------------------------------------
# Test-set decontamination — n-gram overlap between train and held-out
# ---------------------------------------------------------------------------


@register(
    "decontaminate_train_test",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM shdocs, unnest(shdocs.shs) AS u(shingle)
    ),
    split AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
      FROM documents
    ),
    test_sh AS (
      SELECT DISTINCT shingle FROM sh JOIN split USING (doc_id) WHERE h > 'd'
    ),
    train_sh AS (
      SELECT sh.doc_id, sh.shingle
      FROM sh JOIN split USING (doc_id) WHERE h <= 'b'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM train_sh JOIN test_sh USING (shingle)
    GROUP BY doc_id
    """,
    doc="training-pipeline decontamination: find train-split documents "
    "sharing any 3-word shingle with the held-out test split (the same "
    "deterministic md5 split as train_val_test_split). The held-out "
    "set's distinct shingles are orders of magnitude smaller than the "
    "train corpus, so they broadcast; the train side explodes its "
    "per-doc distinct shingles map-side and only contaminated "
    "(doc, shingle) hits reach the final groupBy shuffle. At 100 TB "
    "the broadcast bound is the test corpus size, not the train size; "
    "if the held-out set outgrows broadcast, the same plan degrades "
    "gracefully to a shuffle join on the shingle key.",
)
def decontaminate_train_test(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)

    def shingles_of(side: DataFrame) -> DataFrame:
        # Arrow kernel, not explode(shingle_array(...)): the nested HOF
        # is interpreted and was the bench's biggest timing instability
        return spread(side.select("doc_id", "text")).mapInPandas(
            _shingle_rows_kernel, "doc_id long, shingle string"
        )

    test_sh = shingles_of(docs.filter(h > "d")).select("shingle").distinct()
    train_sh = shingles_of(docs.filter(h <= "b"))
    return (
        train_sh.join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Per-source document cap — anti-spam / domain-balance filter
# ---------------------------------------------------------------------------

_CAP_PER_SOURCE = 10
_CAP_SALTS = 16


@register(
    "cap_per_source",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= {_CAP_PER_SOURCE}
    """,
    doc="training-pipeline domain balancing: keep at most K=10 documents "
    "per source, selected by deterministic md5(doc_id) rank (an unbiased, "
    "re-run-stable sample of each source, unlike first-K-by-ingest-order). "
    "Two-phase exact cap for skewed sources: phase 1 caps each "
    "(source, salt) sub-group to K — a hot source with 10^8 docs never "
    "sorts in one task — phase 2 re-ranks the <= K*salts survivors per "
    "source. Every member of the true per-source top-K survives its "
    "salt group's top-K, so the result is exact.",
)
def cap_per_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    salted = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
        F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_SALTS)).alias("_salt"),
    )
    w1 = Window.partitionBy("source", "_salt").orderBy("_h", "doc_id")
    pre = salted.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= _CAP_PER_SOURCE
    )
    w2 = Window.partitionBy("source").orderBy("_h", "doc_id")
    return (
        pre.withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= _CAP_PER_SOURCE)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Stratified sampling — deterministic per-stratum downsampling
# ---------------------------------------------------------------------------


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ('0x' || substr(md5('strat#' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               AS u16
      FROM documents) t
    WHERE u16 < CASE lang WHEN 'en' THEN 16384
                          WHEN 'zh' THEN 32768
                          ELSE 65536 END
    """,
    doc="training-pipeline language rebalancing: deterministic "
    "per-stratum sampling — keep 25% of 'en', 50% of 'zh', 100% of "
    "everything else, decided by a 16-bit slice of a salted md5 of the "
    "doc id. Pure map-side filter: zero shuffle at any scale, exactly "
    "reproducible across runs and repartitionings (rand()-based "
    "sampling is neither), and the salt decorrelates it from the "
    "train/val/test split hash.",
)
def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("strat#"), F.col("doc_id").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    thresh = (
        F.when(F.col("lang") == "en", 16384)
        .when(F.col("lang") == "zh", 32768)
        .otherwise(65536)
    )
    return docs.filter(u16 < thresh).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Sequence packing — concat-and-chunk token-budget binning
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {_PACK_BUDGET} AS BIGINT) AS bin_id
    FROM toks
    """,
    doc="training-pipeline sequence packing: concat-and-chunk — documents "
    "in deterministic doc_id order are laid end-to-end and cut every 512 "
    "tokens; each doc is tagged with the bin its first token lands in "
    "(exclusive running sum DIV budget). The running sum uses the "
    "two-phase global_cumsum (range-repartition, local cumsum, broadcast "
    "partition offsets) — no single-partition window, exact at any "
    "scale.",
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import global_cumsum

    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    # the running sum consumes COALESCE(n_tokens, 0): SQL window SUM
    # skips NULLs (a NULL-text doc occupies zero tokens but still gets
    # the bin its position lands in, per the oracle's COALESCE), while
    # an un-coalesced NULL would poison the exclusive cumsum into a
    # NULL bin_id (round-7 review)
    cum = global_cumsum(
        toks.withColumn("_nt0", F.coalesce(F.col("n_tokens"), F.lit(0))),
        [F.asc("doc_id")],
        F.col("_nt0"),
        cumsum_col="_excl",
        inclusive=False,
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"CAST(_excl DIV {_PACK_BUDGET} AS BIGINT)").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# Quality-filter funnel — per-stage survivor counts in one pass
# ---------------------------------------------------------------------------


@register(
    "quality_filter_funnel",
    oracle="""
    WITH d AS (
      SELECT n_chars, len(string_split(text, ' ')) AS n_tokens, lang
      FROM documents),
    agg AS (SELECT
      CAST(count(*) AS BIGINT) AS c0,
      CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 400) AS BIGINT) AS c1,
      CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 400
                              AND n_tokens >= 30) AS BIGINT) AS c2,
      CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 400
                              AND n_tokens >= 30
                              AND lang IN ('en','de','fr','es')) AS BIGINT) AS c3
      FROM d)
    SELECT 0 AS stage_id, 'total' AS stage, c0 AS n_surviving FROM agg
    UNION ALL SELECT 1, 'len_100_400', c1 FROM agg
    UNION ALL SELECT 2, 'min_30_tokens', c2 FROM agg
    UNION ALL SELECT 3, 'lang_whitelist', c3 FROM agg
    """,
    doc="training-pipeline observability: the survivor count after each "
    "cumulative quality-filter stage (length band, minimum token count, "
    "language whitelist), computed as ONE conditional aggregation over "
    "a single scan — not one job per stage — then unpivoted with "
    "stack(). Partial aggregation reduces each task to four counters, "
    "so the shuffle is O(partitions) regardless of corpus size.",
)
def quality_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    d = docs.select(
        "n_chars", F.size(F.split(F.col("text"), " ")).alias("n_tokens"), "lang"
    )
    len_ok = F.col("n_chars").between(100, 400)
    tok_ok = len_ok & (F.col("n_tokens") >= 30)
    lang_ok = tok_ok & F.col("lang").isin("en", "de", "fr", "es")

    def cnt(cond: F.Column, name: str) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    agg = d.agg(
        F.count(F.lit(1)).alias("c0"),
        cnt(len_ok, "c1"),
        cnt(tok_ok, "c2"),
        cnt(lang_ok, "c3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 0, 'total', c0, 1, 'len_100_400', c1, "
            "2, 'min_30_tokens', c2, 3, 'lang_whitelist', c3) "
            "AS (stage_id, stage, n_surviving)"
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
    SELECT doc_id, token, tf, CAST(rnk AS INT) AS rnk FROM (
      SELECT t.doc_id, t.token, t.tf,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf AS DOUBLE)
                        * ln(CAST(nn.n AS DOUBLE) / CAST(d.df AS DOUBLE)) DESC,
                        t.token) AS rnk
      FROM tf t JOIN df d USING (token) CROSS JOIN nn) s
    WHERE rnk <= 3
    """,
    doc="text analysis: top-3 TF-IDF terms per document. tf and df are "
    "exact integer aggregates; the score tf*ln(N/df) is a single "
    "fixed-order float expression (identical in both engines) and only "
    "integer ranks are emitted. The document-frequency table is "
    "vocabulary-sized -> broadcast into the tf join; the rank window is "
    "partitioned by doc_id (never global). Two shuffles total at any "
    "corpus size: (doc,term) partial-agg and the per-doc window.",
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # df as a per-token window over the tf table (round-18; was a
    # broadcast of a token-level aggregate): the broadcast build was a
    # SEPARATE job whose plan re-ran tokenize + the (doc, token)
    # aggregation end to end (exchange reuse never crosses a broadcast
    # build's job boundary), and at 100 TB it would broadcast the FULL
    # VOCABULARY. One whole-partition count window on the token key is
    # the same exact integer, costs one hash exchange of the compact
    # (doc_id, token, tf) table, and tokenizes once.
    w_df = Window.partitionBy("token")
    nn = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df).cast("bigint"))
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "_score",
            F.col("tf").cast("double")
            * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "rnk")
    )


# ---------------------------------------------------------------------------
# PMI collocations — corpus-level adjacent-bigram association
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


@register(
    "pmi_bigrams_topk",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
    uni AS (
      SELECT t AS w, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(ts) AS u(t) WHERE t <> '' GROUP BY 1
    ),
    big AS (
      SELECT b AS bigram, CAST(count(*) AS BIGINT) AS c_xy
      FROM (SELECT CASE WHEN len(ts) >= 2
                        THEN [ts[i] || ' ' || ts[i+1]
                              FOR i IN range(1, len(ts))]
                        ELSE [] END AS bs
            FROM toks) t,
           unnest(t.bs) AS u(b)
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
    totb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS m FROM big),
    scored AS (
      SELECT bigram, c_xy,
             ln((CAST(c_xy AS DOUBLE) / CAST(m AS DOUBLE))
                / ((CAST(cx.c AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(cy.c AS DOUBLE) / CAST(n AS DOUBLE)))) AS score
      FROM big
      JOIN uni cx ON cx.w = string_split(bigram, ' ')[1]
      JOIN uni cy ON cy.w = string_split(bigram, ' ')[2]
      CROSS JOIN tot CROSS JOIN totb
      WHERE c_xy >= {_PMI_MIN_COUNT}
    )
    SELECT bigram, c_xy,
           CAST(row_number() OVER (ORDER BY score DESC, bigram) AS INT) AS rnk
    FROM scored QUALIFY rnk <= 20
    """,
    doc="text analysis: top-20 adjacent-word collocations by pointwise "
    "mutual information, min count 5. Bigrams are built map-side from "
    "the token array (no self-join of the token table); unigram counts "
    "are vocabulary-sized and broadcast twice; corpus totals are 1-row "
    "broadcasts; the PMI score is one fixed-order float expression and "
    "only integer ranks/counts are emitted. Final top-k is TakeOrdered.",
)
def pmi_bigrams_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import top_k_ranked

    docs = spread(load(spark, sf, "documents"))
    toks = docs.select(F.split(F.col("text"), " ").alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bigs = F.when(
        F.size("ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("ts", i), F.element_at("ts", i + 1)
            ),
        ),
    )  # no otherwise: null array -> explode emits nothing (matches ELSE [])
    big = (
        toks.select(F.explode(bigs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    totb = big.agg(F.sum("c_xy").cast("bigint").alias("m"))
    parts = F.split(F.col("bigram"), " ")
    scored = (
        big.filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .join(
            F.broadcast(uni.select(F.col("w").alias("_w1"), F.col("c").alias("_cx"))),
            parts.getItem(0) == F.col("_w1"),
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("_w2"), F.col("c").alias("_cy"))),
            parts.getItem(1) == F.col("_w2"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(totb))
        .withColumn(
            "score",
            F.log(
                (F.col("c_xy").cast("double") / F.col("m").cast("double"))
                / (
                    (F.col("_cx").cast("double") / F.col("n").cast("double"))
                    * (F.col("_cy").cast("double") / F.col("n").cast("double"))
                )
            ),
        )
    )
    return top_k_ranked(scored, [F.desc("score"), F.asc("bigram")], 20).select(
        "bigram", "c_xy", "rnk"
    )


# ---------------------------------------------------------------------------
# Intra-document repetition filter (Gopher/C4-style quality rule)
# ---------------------------------------------------------------------------


@register(
    "repetition_ratio_filter",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")})
    SELECT doc_id,
           CAST(len(shs) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(shs)) AS BIGINT) AS n_distinct,
           (len(shs) - len(list_distinct(shs))) * 10 >= len(shs)
             AS flagged
    FROM shdocs
    """,
    doc="training-pipeline quality rule: intra-document repetition — the "
    "fraction of duplicated 3-word shingles WITHIN each document "
    "(Gopher-style repetition filter; docs with >= 10% duplicate "
    "shingles are flagged). Entirely map-side array arithmetic on the "
    "per-row shingle array: no explode, no shuffle, no state — rides "
    "whole-stage codegen at any corpus size. The threshold compare is "
    "cross-multiplied integers (exact, no float ratio).",
)
def repetition_ratio_filter(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    shs = shingle_array(F.col("text"))
    # DuckDB's list_distinct STRIPS NULL elements while Spark's
    # array_distinct keeps them — for a NULL-text doc (shs = [NULL])
    # the engines disagreed on n_distinct/flagged (round-7 review);
    # filtering nulls out of the distinct set matches the oracle and is
    # a no-op for real shingles (split never yields NULL)
    n_distinct = F.size(
        F.filter(F.array_distinct(shs), lambda x: x.isNotNull())
    )
    return docs.select(
        "doc_id",
        F.size(shs).cast("bigint").alias("n_shingles"),
        n_distinct.cast("bigint").alias("n_distinct"),
        ((F.size(shs) - n_distinct) * 10 >= F.size(shs)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Source-mix upsampling + deterministic epoch shuffle order
# ---------------------------------------------------------------------------


@register(
    "source_mix_upsample",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src1', 'src2') THEN 3
                  WHEN source = 'src3' THEN 2
                  ELSE 1 END AS w
      FROM documents
    ),
    copies AS (
      SELECT doc_id, source, CAST(c AS BIGINT) AS copy
      FROM weighted, unnest(range(0, w)) AS u(c)
    )
    SELECT doc_id, source, copy,
           CAST(row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR) || '#' || CAST(copy AS VARCHAR)),
                      doc_id, copy) AS INT) AS shuffle_rnk
    FROM copies
    """,
    doc="training-pipeline data mixing: per-source upsampling weights "
    "(src1/src2 3x, src3 2x, rest 1x) applied by replicating rows with "
    "a copy index (map-side sequence+explode — no join, no shuffle), "
    "then a DETERMINISTIC global shuffle order for the training epoch: "
    "rank over md5(doc_id#copy) via the two-phase range-partitioned "
    "ranker (ranks.global_row_number) — reproducible across runs and "
    "re-partitionings, with no single-partition sort. The oracle's "
    "naive global window computes the same permutation.",
)
def source_mix_upsample(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import global_row_number

    docs = load(spark, sf, "documents")
    w = (
        F.when(F.col("source").isin("src1", "src2"), 3)
        .when(F.col("source") == "src3", 2)
        .otherwise(1)
    )
    copies = docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), w - 1)).alias("copy"),
    ).withColumn("copy", F.col("copy").cast("bigint"))
    keyed = copies.withColumn(
        "_h",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.col("copy").cast("string"),
            )
        ),
    )
    ranked = global_row_number(
        keyed,
        [F.asc("_h"), F.asc("doc_id"), F.asc("copy")],
        rank_col="shuffle_rnk",
    )
    return ranked.select("doc_id", "source", "copy", "shuffle_rnk")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS-style robust document fingerprinting)
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window of consecutive shingle hashes; guarantees every
# match of >= w+2 consecutive shingles shares a selected fingerprint


@register(
    "text_winnowing",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    hashed AS (
      SELECT doc_id, [md5(s) FOR s IN shs] AS hs FROM shdocs
    ),
    selected AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {_WINNOW_W}
                  THEN list_distinct([list_min(hs[i:i+{_WINNOW_W}-1])
                                     FOR i IN range(1, len(hs) - {_WINNOW_W} + 2)])
                  ELSE list_distinct([list_min(hs)]) END AS fps
      FROM hashed
    )
    SELECT doc_id, fp AS fingerprint
    FROM selected, unnest(fps) AS u(fp)
    """,
    doc="text analysis: winnowing fingerprints (MOSS) — the minimum md5 "
    "in every window of 4 consecutive 3-gram hashes, deduplicated per "
    "document. Guarantees any shared run of >= 6 consecutive shingles "
    "between two documents shares at least one selected fingerprint, at "
    "~1/(w/2) the fingerprint density of full shingling — the standard "
    "robust containment/contamination index. Map-only (Arrow "
    "mapInPandas — measured 5x faster than the best interpreted-HOF "
    "Catalyst form, see the function comment); the only shuffle is "
    "whatever the consumer does with (doc_id, fingerprint).",
)
def text_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    # Implementation choice, MEASURED at sf0.1 (5000 docs, ~260k
    # shingles, local[32]):
    # - nested zip_with least-fold (the original form): 54s — Catalyst
    #   higher-order functions are interpreted (outside wholestage
    #   codegen) and the nested-lambda chain re-evaluates its child
    #   arrays per element, which is super-linear in window size;
    # - transform(sequence) + array_min(slice) over a pre-materialized
    #   hash attribute: 3.6s — linear, but every window still pays the
    #   interpreted-HOF per-element dispatch;
    # - Arrow mapInPandas (this form): 0.7s — one Python loop per doc,
    #   vectorized batch transfer, zero shuffle (map-only like the
    #   others; spread() round-robin is the only Exchange).
    # Semantics replicate shingle_array()/the DuckDB oracle exactly:
    # split on single spaces, 3-word shingles ([text] when < 3 tokens),
    # lowercase-hex md5, min per W=4 window, distinct per doc.
    docs = spread(load(spark, sf, "documents").select("doc_id", "text"))
    w = _WINNOW_W

    def winnow(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            fps: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    # NULL text: the oracle's [md5(NULL)] = [NULL],
                    # list_distinct strips it, unnest emits NOTHING —
                    # the ''-coercion used to invent an md5('') row
                    # (round-7 review)
                    continue
                toks = text.split(" ")
                if len(toks) >= 3:
                    shs = [
                        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                    ]
                else:
                    shs = [text]
                hs = [hashlib.md5(s.encode()).hexdigest() for s in shs]
                if len(hs) >= w:
                    sel = {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
                else:
                    sel = {min(hs)}
                for v in sorted(sel):
                    ids.append(doc_id)
                    fps.append(v)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return docs.mapInPandas(winnow, "doc_id long, fingerprint string")


# ---------------------------------------------------------------------------
# PII redaction — map-side regex scrubbing (emails / IPs / phone-like)
# ---------------------------------------------------------------------------

# One regex dialect that behaves identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b word boundaries.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = "\\b\\d{3}-\\d{4}\\b"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.0.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
    doc="training-pipeline PII scrub: count and redact emails, IPv4 "
    "addresses and phone-like digit runs with regexes that behave "
    "identically under Java regex and RE2. The synthetic corpus has no "
    "PII, so deterministic PII is appended per row first — exercising "
    "every pattern on every row. Pure map (regexp_replace / "
    "regexp_extract_all are codegen'd JVM expressions): zero shuffle at "
    "any scale, and the scan only reads (doc_id, text).",
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    aug = F.concat(
        F.col("text"),
        F.lit(" user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"), _PII_IP, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_IP), 0))
        .cast("bigint")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
        red.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Importance-weighted sampling — deterministic hash-threshold acceptance
# ---------------------------------------------------------------------------


@register(
    "importance_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             CAST(floor(least(0.9, n_chars / 512.0) * 4294967296.0)
                  AS BIGINT) AS thr
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM w
    WHERE substr(md5('imp|' || CAST(doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(thr), 8, '0'))
    """,
    doc="training-pipeline importance sampling (DSIR-style): accept each "
    "document with probability proportional to a quality weight "
    "(here: length-derived, capped at 0.9) by comparing the first 8 hex "
    "chars of md5(doc_id) against the weight rendered as an 8-hex-char "
    "threshold. Deterministic under re-runs and repartitioning (unlike "
    "rand()), pure map, zero shuffle; the hex-string comparison avoids "
    "hex->int conversion differences between engines. n_chars/512 and "
    "*2^32 are exact in binary floating point, so the threshold is "
    "bit-identical cross-engine.",
)
def importance_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    weight = F.least(F.lit(0.9), F.col("n_chars") / 512.0)
    thr = F.floor(weight * 4294967296.0).cast("bigint")
    thr_hex = F.lower(F.lpad(F.hex(thr), 8, "0"))
    h = F.substring(
        F.md5(F.concat(F.lit("imp|"), F.col("doc_id").cast("string"))), 1, 8
    )
    return docs.filter(h < thr_hex).select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# Duplicated-substring spans — exact n-gram span dedup (Lee et al. style)
# ---------------------------------------------------------------------------


@register(
    "dedup_substring_spans",
    oracle="""
    WITH sp AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 5
                  THEN list_distinct([md5(array_to_string(toks[i:i+4], ' '))
                                      FOR i IN range(1, len(toks) - 3)])
                  ELSE [md5(text)] END AS spans
      FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
            FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(spans) AS h FROM sp),
    dup AS (SELECT h FROM ex GROUP BY h HAVING count(*) >= 2),
    nd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
      FROM ex JOIN dup USING (h) GROUP BY doc_id
    )
    SELECT sp.doc_id,
           CAST(len(spans) AS BIGINT) AS n_spans,
           COALESCE(nd.n_dup, 0) AS n_dup,
           CAST(CASE WHEN 2 * COALESCE(nd.n_dup, 0) > len(spans)
                     THEN 1 ELSE 0 END AS BIGINT) AS dup_heavy
    FROM sp LEFT JOIN nd USING (doc_id)
    """,
    doc="dedup: exact duplicated-substring detection (the n-gram-span "
    "form of Lee et al.'s 'Deduplicating Training Data...' substring "
    "dedup): a 5-token span is duplicated if its hash occurs in >= 2 "
    "per-doc distinct span sets; per doc, report total/duplicated span "
    "counts and a >50-percent-duplicated flag (cross-multiplied integer "
    "compare, no floats). Span hashes are built map-side per row in one "
    "Arrow pass (a Catalyst transform() with 5 element_at's per window "
    "is interpreted, not codegen'd — the mapInPandas form measured ~4x "
    "faster, same cliff as winnowing); the shuffles carry only "
    "(doc_id, 32-byte hash) pairs, never text, and n_spans is the "
    "per-doc row count of the already-distinct exploded hashes — so "
    "the heavy side of the plan is hash-only at 100 TB.",
)
def dedup_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))

    def span_hashes(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            hs: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):  # NULL text (None/NaN)
                    # oracle: spans = [md5(NULL)] = [NULL] — one span
                    # row whose NULL hash can never equi-join into the
                    # dup set. Coercing to '' made two NULL docs (or a
                    # NULL + an empty doc) share md5('') and flag each
                    # other (round-7 review).
                    ids.append(doc_id)
                    hs.append(None)
                    continue
                toks = text.split(" ")
                if len(toks) >= 5:
                    seen = set()
                    for i in range(len(toks) - 4):
                        h = hashlib.md5(
                            " ".join(toks[i : i + 5]).encode()
                        ).hexdigest()
                        if h not in seen:
                            seen.add(h)
                            ids.append(doc_id)
                            hs.append(h)
                else:
                    ids.append(doc_id)
                    hs.append(hashlib.md5(text.encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "h": hs}
            )

    ex = (
        docs.select("doc_id", "text")
        .mapInPandas(span_hashes, "doc_id long, h string")
        .localCheckpoint(eager=False)
    )
    base = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans")
    )
    dup = ex.groupBy("h").agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") >= 2
    )
    nd = (
        ex.join(dup.select("h"), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        base.join(nd, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce(F.col("n_dup"), F.lit(0).cast("bigint")).alias("n_dup"),
            F.when(
                2 * F.coalesce(F.col("n_dup"), F.lit(0)) > F.col("n_spans"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dup_heavy"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate removal — corpus-level hot-block strip + order-preserving rebuild
# ---------------------------------------------------------------------------


@register(
    "boilerplate_strip_rebuild",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    b AS (SELECT doc_id, toks,
                 unnest(generate_series(
                     1, CAST(ceil(len(toks) / 5.0) AS INT))) AS pos
          FROM t),
    blk AS (SELECT doc_id, pos,
                   array_to_string(
                       toks[(pos - 1) * 5 + 1 : (pos - 1) * 5 + 5],
                       ' ') AS block
            FROM b),
    hot AS (SELECT h
            FROM (SELECT DISTINCT doc_id, md5(block) AS h FROM blk)
            GROUP BY h HAVING count(*) >= 2),
    keep AS (SELECT doc_id, pos, block FROM blk
             WHERE md5(block) NOT IN (SELECT h FROM hot)),
    reb AS (SELECT doc_id,
                   string_agg(block, ' ' ORDER BY pos) AS cleaned,
                   CAST(count(*) AS BIGINT) AS n_kept
            FROM keep GROUP BY doc_id),
    base AS (SELECT doc_id,
                    CAST(ceil(len(string_split(text, ' ')) / 5.0) AS BIGINT)
                      AS n_blocks
             FROM documents)
    SELECT base.doc_id,
           COALESCE(reb.cleaned, '') AS cleaned,
           base.n_blocks - COALESCE(reb.n_kept, 0) AS n_removed
    FROM base LEFT JOIN reb USING (doc_id)
    """,
    doc="text transform: C4-style corpus-level boilerplate removal — any "
    "5-token block whose hash appears in >= 2 distinct documents is "
    "stripped from every document, and each document is rebuilt with its "
    "surviving blocks in original order (posexplode -> broadcast "
    "hot-flag join -> one groupBy(doc_id) that sorts struct(pos, block) "
    "and drops flagged blocks). Unlike dedup_substring_spans "
    "(detection/flagging) this is the transform: the output is the "
    "cleaned corpus. Scale: hot-block detection shuffles only (doc_id, "
    "32-byte hash) pairs; the flag-join side is the tiny hot-hash set "
    "(boilerplate is by definition concentrated), so Catalyst "
    "broadcasts it; the single shuffle that carries text is the rebuild "
    "groupBy(doc_id) — inherent to rewriting the corpus, evenly "
    "partitioned by doc id, one explode and one pass. The blocks array "
    "is cut from the lineage with localCheckpoint so Catalyst cannot "
    "inline the tokenize+slice chain into the explode (avoids "
    "per-element re-evaluation of split()).",
)
def boilerplate_strip_rebuild(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    n_blocks = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
    per_doc = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), n_blocks),
            lambda p: F.concat_ws(
                " ", F.slice(toks, (p - F.lit(1)) * F.lit(5) + F.lit(1), 5)
            ),
        ).alias("blocks"),
    ).localCheckpoint(eager=False)
    blk = per_doc.select(
        "doc_id", F.posexplode("blocks").alias("pos", "block")
    ).withColumn("h", F.md5("block"))
    hot = (
        blk.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    tagged = blk.join(
        hot.withColumn("is_hot", F.lit(True)), "h", "left"
    ).select("doc_id", "pos", "block", F.coalesce("is_hot", F.lit(False)).alias("is_hot"))
    reb = tagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "block", "is_hot"))
                    ),
                    lambda s: ~s["is_hot"],
                ),
                lambda s: s["block"],
            ),
        ).alias("cleaned"),
        F.sum(F.when(~F.col("is_hot"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )
    # mirror the oracle's base LEFT JOIN: a NULL-text doc produces no
    # blocks (posexplode of a NULL array emits nothing) but must still
    # appear in the output as ('', NULL) — dropping it diverged from
    # the oracle (round-7 review, latent until testdata carries NULLs)
    base = docs.select("doc_id", n_blocks.cast("bigint").alias("n_blocks"))
    return base.join(reb, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        (F.col("n_blocks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
    )


# ---------------------------------------------------------------------------
# Fuzzy join — SymSpell symmetric-delete blocking, exact result
# ---------------------------------------------------------------------------


@register(
    "fuzzy_join_ed1",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="record linkage at scale: all customer-name pairs within edit "
    "distance 1 via symmetric-delete (SymSpell) blocking — every "
    "ED<=1 pair provably shares a deletion key, so the hash equi-join "
    "on (len+1) keys/row finds the exact all-pairs answer without an "
    "all-pairs comparison; the DuckDB oracle IS the brute-force "
    "all-pairs levenshtein. Integer edit distances — no float drift. "
    "Scales as O(n * len) exploded keys + bucketed join, vs the "
    "oracle's O(n^2) scan.",
)
def fuzzy_join_ed1(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.dedup import edit_distance_join

    # single small parquet file → 1 scan split; spread() parallelizes
    # the deletion-key explode and the join map side across cores
    cust = spread(load(spark, sf, "customer")).select("c_custkey", "c_name")
    return edit_distance_join(
        cust, id_col="c_custkey", str_col="c_name", max_distance=1
    )


# ---------------------------------------------------------------------------
# Heavy hitters (map-side candidate pruning), privacy audits, GDPR cascade
# ---------------------------------------------------------------------------


@register(
    "heavy_hitter_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    ne AS (SELECT token FROM toks WHERE token <> ''),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ne)
    SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM ne GROUP BY token
    HAVING count(*) * 50 > (SELECT n FROM tot)
    """,
    doc="heavy hitters (token frequency > n/k, k=50) with a map-side "
    "candidate phase: each partition tokenizes and counts its own "
    "documents in one Arrow pass and emits only tokens with local "
    "count*k > local token count — by averaging, any global heavy "
    "hitter must be locally heavy in at least one partition, so the "
    "candidate set is a guaranteed superset and vocabulary-sized, not "
    "token-stream-sized. Exact global counts then run only for "
    "broadcast candidates: at 100 TB the full-vocabulary groupBy "
    "(billions of distinct n-grams) never happens; the shuffle carries "
    "candidate tokens only. Thresholds are integer cross-multiplied.",
)
def heavy_hitter_tokens(spark: SparkSession, sf: str) -> DataFrame:
    k = 50
    docs = load(spark, sf, "documents").select("text")

    def local_candidates(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        rows = 0
        for pdf in batches:
            for text in pdf["text"]:
                if not isinstance(text, str):
                    continue  # NULL text: no tokens (oracle: split(NULL) -> none)
                for tok in text.split(" "):
                    if tok:
                        rows += 1
                        counts[tok] = counts.get(tok, 0) + 1
        cand = [t for t, c in counts.items() if c * k > rows]
        yield pd.DataFrame({"token": pd.Series(cand, dtype="object")})

    candidates = docs.mapInPandas(local_candidates, "token string").distinct()
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * k > F.col("_n"))
        .select("token", "n_occurrences")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, bal_bucket
    HAVING count(*) < 5
    """,
    doc="privacy audit: k-anonymity violations over the quasi-identifier "
    "(nation, market segment, balance-to-$100 bucket) — equivalence "
    "classes smaller than k=5 re-identify their members and must be "
    "suppressed or generalized before a training-data release. One "
    "map-side-combinable groupBy on the QI columns; output is bounded "
    "by QI cardinality, not rows. The bucket floor is double-identical "
    "in both engines (same IEEE divide then floor).",
)
def k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 100).cast("bigint").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .filter(F.col("group_size") < 5)
    )


@register(
    "purge_user_cascade",
    oracle="""
    WITH forget AS (
      SELECT c_custkey FROM customer
      WHERE c_acctbal < 0 AND c_mktsegment = 'AUTOMOBILE'
    ),
    kept_cust AS (
      SELECT c_custkey FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM forget)
    ),
    kept_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM forget)
    ),
    kept_lineitem AS (
      SELECT l_orderkey FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM kept_orders)
    )
    SELECT 'customer' AS table_name,
           (SELECT CAST(count(*) AS BIGINT) FROM kept_cust) AS n_remaining
    UNION ALL
    SELECT 'orders', (SELECT CAST(count(*) AS BIGINT) FROM kept_orders)
    UNION ALL
    SELECT 'lineitem', (SELECT CAST(count(*) AS BIGINT) FROM kept_lineitem)
    """,
    doc="GDPR right-to-be-forgotten cascade: a forget-set of customers "
    "propagates through the foreign-key chain customer -> orders -> "
    "lineitem via anti-joins, returning per-table surviving row "
    "counts. The forget-set is broadcast (it is always small relative "
    "to the fact tables), so each cascade level is a broadcast "
    "anti-join — no shuffle of the big side; the orders->lineitem "
    "level semi-joins on the surviving keys the same way a Delta "
    "MERGE DELETE would prune files.",
)
def purge_user_cascade(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    forget = cust.filter(
        (F.col("c_acctbal") < 0) & (F.col("c_mktsegment") == "AUTOMOBILE")
    ).select("c_custkey")
    kept_cust = cust.join(F.broadcast(forget), "c_custkey", "left_anti")
    kept_orders = orders.join(
        F.broadcast(forget),
        orders.o_custkey == forget.c_custkey,
        "left_anti",
    )
    # lineitems survive iff their order survives; anti-join against the
    # (small) set of purged order keys keeps the big side shuffle-free
    purged_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    kept_li = li.join(
        F.broadcast(purged_orders),
        li.l_orderkey == purged_orders.o_orderkey,
        "left_anti",
    )

    def counted(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_remaining"),
        )

    return (
        counted(kept_cust, "customer")
        .unionAll(counted(kept_orders, "orders"))
        .unionAll(counted(kept_li, "lineitem"))
    )


@register(
    "feature_hashing_sparse",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT)
                  % 1024 AS BIGINT) AS feat_idx
      FROM toks WHERE token <> ''
    )
    SELECT doc_id, feat_idx, CAST(count(*) AS BIGINT) AS cnt
    FROM hashed GROUP BY doc_id, feat_idx
    """,
    doc="feature hashing (the hashing trick): tokens map to a fixed "
    "1024-bucket feature space via a 32-bit md5 prefix — the sparse "
    "(doc, feature, count) triples a linear model or nearest-centroid "
    "classifier trains on, with NO vocabulary table to build, "
    "broadcast, or keep consistent across a 100 TB corpus. Hashing is "
    "map-side; the one shuffle aggregates (doc_id, idx) pairs. The "
    "md5-prefix % buckets arithmetic is integer-identical in both "
    "engines.",
)
def feature_hashing_sparse(spark: SparkSession, sf: str) -> DataFrame:
    toks = (
        spread(load(spark, sf, "documents"))
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    idx = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
        .cast("bigint")
        % 1024
    )
    return (
        toks.select("doc_id", idx.cast("bigint").alias("feat_idx"))
        .groupBy("doc_id", "feat_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


@register(
    "join_key_skew_report",
    oracle="""
    WITH freq AS (
      SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             CAST(SUM(cnt) AS BIGINT) AS n_rows
      FROM freq
    )
    SELECT f.key, f.cnt,
           CAST(f.cnt * t.n_keys > 4 * t.n_rows AS INT) AS is_hot
    FROM freq f CROSS JOIN tot t
    ORDER BY f.cnt DESC, f.key LIMIT 10
    """,
    doc="shuffle-planning diagnosis: the top-10 hottest join keys with "
    "a >4x-mean hotness flag (integer cross-multiplied — the exact "
    "signal that decides between plain hash join, salting, and AQE "
    "skew splitting). Per-key counts are one map-side-combinable "
    "groupBy; the report is TakeOrdered over key-cardinality rows, "
    "and the scalar stats broadcast. This is the operator you run "
    "BEFORE choosing the strategy the salted_skew_join entry "
    "demonstrates.",
)
def join_key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    freq = (
        load(spark, sf, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            (F.col("cnt") * F.col("n_keys") > 4 * F.col("n_rows"))
            .cast("int")
            .alias("is_hot"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Source mixture allocation — temperature-scaled sampling budget per source
# ---------------------------------------------------------------------------

_MIX_BUDGET = 1000


@register(
    "source_mixture_allocation",
    oracle=f"""
    WITH w AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(count(*))) AS BIGINT) AS sqrt_w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(sqrt_w) AS BIGINT) AS tot_w FROM w)
    SELECT source, n_docs, sqrt_w,
           CAST(({_MIX_BUDGET} * sqrt_w) // tot_w AS BIGINT) AS alloc_docs
    FROM w CROSS JOIN tot
    """,
    doc="training-pipeline mixture weighting: allocate a sampling budget "
    "of 1000 documents across sources with sqrt-temperature smoothing "
    "(alpha=0.5: small sources are upweighted relative to proportional "
    "sampling, the standard multi-source LM mixture trick). All "
    "arithmetic is integer-exact cross-engine: floor(sqrt(bigint)) is "
    "stable (IEEE sqrt is correctly rounded in both engines) and the "
    "allocation is integer division — no float aggregation anywhere. "
    "One map-side-combinable groupBy over the corpus; the per-source "
    "weight table is dimension-sized and broadcast for the total.",
)
def source_mixture_allocation(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        load(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn("sqrt_w", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint"))
    )
    tot = w.agg(F.sum("sqrt_w").cast("bigint").alias("tot_w"))
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sqrt_w",
        F.expr(f"({_MIX_BUDGET} * sqrt_w) div tot_w").cast("bigint").alias(
            "alloc_docs"
        ),
    )


# ---------------------------------------------------------------------------
# Type-token ratio — per-document lexical diversity
# ---------------------------------------------------------------------------


@register(
    "type_token_ratio",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           CAST((1000000 * len(list_distinct(toks))) // len(toks) AS BIGINT)
             AS ttr_ppm
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE text IS NOT NULL) t
    WHERE len(toks) > 0
    """,
    doc="text quality: per-document type-token ratio (distinct tokens / "
    "total tokens, in exact ppm via integer division — the standard "
    "lexical-diversity signal; low TTR flags boilerplate and generated "
    "spam). Pure map over the corpus: the token array never explodes "
    "and nothing shuffles at any scale. Tokenization matches "
    "explode_tokens (split on single space, empties kept by both "
    "engines' split).",
)
def type_token_ratio(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    out = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
    ).filter(F.col("n_tokens") > 0)
    return out.withColumn(
        "ttr_ppm", F.expr("(1000000 * n_types) div n_tokens").cast("bigint")
    )


# ---------------------------------------------------------------------------
# Document rarity score — mean corpus frequency of a document's tokens
# ---------------------------------------------------------------------------


@register(
    "doc_rarity_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE text IS NOT NULL
    ),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok2 GROUP BY token
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(f.cnt) AS BIGINT) AS sum_freq,
           CAST((100 * SUM(f.cnt)) // count(*) AS BIGINT) AS mean_freq_x100
    FROM tok2 t JOIN freq f ON t.token = f.token
    GROUP BY t.doc_id
    """,
    doc="text quality: per-document mean corpus frequency of its tokens "
    "(unigram-LM surprisal proxy with integer-exact arithmetic: a "
    "document of globally-rare tokens scores low, gibberish-free "
    "boilerplate scores high — used to stratify pretraining mixtures "
    "by 'typicality'). Two token shuffles (corpus frequency groupBy, "
    "then token->doc re-agg); the frequency join is Zipf-friendly — "
    "the vocabulary is sublinear in corpus size, so at 100 TB the "
    "frequency table is still orders of magnitude smaller than the "
    "token stream and the join co-partitions on the token key "
    "produced by the groupBy, reusing its shuffle.",
)
def doc_rarity_score(spark: SparkSession, sf: str) -> DataFrame:
    tok = (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return (
        tok.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("sum_freq"),
        )
        .withColumn(
            "mean_freq_x100",
            F.expr("(100 * sum_freq) div n_tokens").cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy decontamination — MinHash-LSH band collisions across the split
# ---------------------------------------------------------------------------


@register(
    "decontaminate_fuzzy_lsh",
    oracle=f"""
    WITH shdocs AS ({_SHINGLE_ARR_SQL.format(where="")}),
    seeds AS (SELECT unnest(range(0, {NUM_MINHASHES})) AS seed),
    sig AS (
      SELECT doc_id, seed,
             list_min([md5(s || '#' || CAST(seed AS VARCHAR)) FOR s IN shs])
               AS minhash
      FROM shdocs CROSS JOIN seeds
    ),
    bands AS (
      SELECT doc_id, CAST(seed // {BAND_ROWS} AS INT) AS band,
             md5(string_agg(minhash, '|' ORDER BY seed)) AS band_hash
      FROM sig GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    tagged AS (
      SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h FROM bands
    ),
    test_bands AS (
      SELECT DISTINCT band, band_hash FROM tagged WHERE h > 'd'
    )
    SELECT t.doc_id, CAST(count(DISTINCT t.band) AS BIGINT) AS n_band_hits
    FROM tagged t JOIN test_bands u
      ON t.band = u.band AND t.band_hash = u.band_hash
    WHERE t.h <= 'b'
    GROUP BY t.doc_id
    """,
    doc="training-pipeline fuzzy decontamination: flag train-split "
    "documents whose MinHash-LSH band keys collide with any held-out "
    "test document — catching near-duplicate contamination that "
    "exact-shingle overlap (decontaminate_train_test) misses, e.g. "
    "light paraphrases. Reuses the map-side Arrow band kernel "
    "(signatures never leave the task; only (band, band_hash) keys "
    "shuffle) and the deterministic md5 split; the test side's "
    "distinct band keys are held-out-sized and broadcast, so train "
    "corpus size never enters a shuffle — the same asymmetry argument "
    "as exact decontamination, but robust to edits.",
)
def decontaminate_fuzzy_lsh(spark: SparkSession, sf: str) -> DataFrame:
    # split BEFORE the kernel: each side minhashes only its own split
    # (12/16 + 3/16 of the corpus instead of 2 full passes), and the
    # val slice never gets hashed at all
    docs = load(spark, sf, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)

    def bands_of(side: DataFrame) -> DataFrame:
        return (
            spread(side.select("doc_id", "text"))
            .mapInPandas(
                _minhash_kernel(NUM_MINHASHES, band_rows=BAND_ROWS),
                "doc_id long, band int, band_hash string",
            )
            .filter(F.col("band_hash").isNotNull())
        )

    test_bands = (
        bands_of(docs.filter(h > "d")).select("band", "band_hash").distinct()
    )
    train = bands_of(docs.filter(h <= "b"))
    return (
        train.join(F.broadcast(test_bands), ["band", "band_hash"])
        .groupBy("doc_id")
        .agg(F.count_distinct("band").cast("bigint").alias("n_band_hits"))
    )


# ---------------------------------------------------------------------------
# Dataset card — per-source corpus summary statistics
# ---------------------------------------------------------------------------


@register(
    "dataset_card_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST((100 * SUM(n_chars)) // count(*) AS BIGINT) AS mean_chars_x100,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY source
    """,
    doc="training-pipeline dataset card: per-source corpus summary "
    "(volume, exact mean/min/max document length, language "
    "cardinality) — the table every dataset release ships and every "
    "mixture decision starts from. Single map-side-combinable groupBy; "
    "count(DISTINCT lang) is safe because per-group language "
    "cardinality is tiny (partial distinct aggregation keeps the "
    "shuffle at one row per (source, lang)). Integer-exact everywhere.",
)
def dataset_card_by_source(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.expr("(100 * sum(n_chars)) div count(1)")
            .cast("bigint")
            .alias("mean_chars_x100"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
        )
    )


_BLOOM_BITS = 16384  # m = 2^14
_BLOOM_K = 4


@register(
    "bloom_decontaminate_stats",
    oracle=f"""
    WITH fps AS (
      -- prefix fingerprint (first 3 tokens): coarse enough that real
      -- cross-split collisions exist in the corpus, so the candidate
      -- and confirm paths carry rows (md5-of-whole-text found zero)
      SELECT doc_id,
             md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS fp,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
      FROM documents WHERE text IS NOT NULL
    ),
    test_fp AS (SELECT DISTINCT fp FROM fps WHERE h > 'd'),
    train AS (SELECT doc_id, fp FROM fps WHERE h <= 'd'),
    bloom AS (  -- the sketch state: SET bit positions, exact integers
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(k.i AS VARCHAR) || ':' || fp), 1, 8))
                  AS BIGINT) % {_BLOOM_BITS} AS pos
      FROM test_fp, unnest([0, 1, 2, 3]) AS k(i)
    ),
    probes AS (
      SELECT t.doc_id, t.fp, k.i AS i,
             CAST(('0x' || substr(md5(CAST(k.i AS VARCHAR) || ':' || t.fp), 1, 8))
                  AS BIGINT) % {_BLOOM_BITS} AS pos
      FROM train t, unnest([0, 1, 2, 3]) AS k(i)
    ),
    cand AS (  -- train docs whose EVERY probe hits a set bit
      SELECT doc_id, fp FROM (
        SELECT p.doc_id, p.fp, count(*) AS hits
        FROM probes p JOIN bloom b USING (pos)
        GROUP BY p.doc_id, p.fp
      ) WHERE hits = {_BLOOM_K}
    ),
    confirmed AS (
      SELECT c.doc_id FROM cand c JOIN test_fp x USING (fp)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM train) AS n_train,
           (SELECT CAST(count(*) AS BIGINT) FROM test_fp) AS n_test_fp,
           (SELECT CAST(count(*) AS BIGINT) FROM bloom) AS n_bits_set,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM confirmed) AS n_confirmed
    """,
    doc="portable BLOOM FILTER as a decontamination pre-filter, with "
    "cross-engine value parity for the sketch state AND the readout "
    "(round 8, the md5-parity family of hll_registers_users / "
    "cmsketch_user_counts): the held-out split's document fingerprints "
    "set k=4 md5-derived bits in an m=2^14 filter; a train document is "
    "a CANDIDATE only if all 4 of its probe bits are set, and "
    "candidates alone take the exact fingerprint semi-join. Returns "
    "(n_train, n_test_fp, n_bits_set, n_candidates, n_confirmed) — "
    "every number exact, so the DuckDB oracle recomputes the filter "
    "bit-for-bit and the entry exhibits the guarantee n_candidates >= "
    "n_confirmed with zero false NEGATIVES. At 100 TB this is the "
    "standard shape for cheap cross-split checks: the bit-set is KBs "
    "(broadcast everywhere, mergeable by OR), the expensive exact "
    "join runs only on the candidate sliver, and Spark's own runtime "
    "bloom pruning (spark.sql.optimizer.runtime.bloomFilter) applies "
    "the same idea inside joins automatically.",
)
def bloom_decontaminate_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    fps = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))).alias(
            "fp"
        ),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("h"),
    )
    test_fp = fps.filter(F.col("h") > "d").select("fp").distinct()
    train = fps.filter(F.col("h") <= "d").select("doc_id", "fp")

    ks = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")

    def pos(i_col, fp_col):
        return F.conv(
            F.substring(
                F.md5(F.concat(i_col.cast("string"), F.lit(":"), fp_col)), 1, 8
            ),
            16,
            10,
        ).cast("long") % _BLOOM_BITS

    bloom = (
        test_fp.select(ks, "fp")
        .select(pos(F.col("i"), F.col("fp")).alias("pos"))
        .distinct()
    )
    probes = train.select("doc_id", "fp", ks).select(
        "doc_id", "fp", pos(F.col("i"), F.col("fp")).alias("pos")
    )
    # the bit-set is the broadcast side — it is the KB-sized sketch
    cand = (
        probes.join(F.broadcast(bloom), "pos")
        .groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == _BLOOM_K)
    )
    confirmed = cand.join(F.broadcast(test_fp), "fp", "left_semi")

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    return (
        n(train, "n_train")
        .crossJoin(n(test_fp, "n_test_fp"))
        .crossJoin(n(bloom, "n_bits_set"))
        .crossJoin(n(cand, "n_candidates"))
        .crossJoin(n(confirmed, "n_confirmed"))
    )
