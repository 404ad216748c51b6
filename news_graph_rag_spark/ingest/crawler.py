"""S1 live-crawl source adapter: fundus article stream → raw-articles
DataFrame → quarantine → batch ingest.

Reference surface: ``crawler.py:19-22`` builds a
``fundus.Crawler(PublisherCollection.de, PublisherCollection.uk)`` and
iterates ``crawler.crawl(max_articles=1000)``, then ingests one article
at a time inside a try/except driver loop. Spark-first restatement:

* the crawl itself is inherently a driver-side generator (fundus does
  the HTTP fetching in-process), so the adapter's job is ONLY to turn
  that stream into bounded micro-batches of rows with the explicit
  raw-articles schema (``quarantine._raw_schema``);
* everything after that is the existing set-oriented pipeline —
  ``validate_raw_articles`` (row-level quarantine, replacing the
  per-article try/except) and ``ingest_articles`` (single-pass upserts);
* at scale the crawl is NOT run through the driver: dump batches to
  JSONL/parquet (``dump_articles_jsonl``) and ingest with the
  distributed readers in ``quarantine.py`` — this adapter exists so a
  user of the reference can replay its exact live workflow end-to-end.

fundus is an optional dependency (not installed in CI); every entry
point that needs it fails with an actionable message, and the
object→row mapping is duck-typed so tests drive it with fakes.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from .quarantine import _raw_schema, validate_raw_articles, write_rejected
from .upserts import ingest_articles

try:  # pragma: no cover - exercised only when fundus is installed
    import fundus  # type: ignore

    HAVE_FUNDUS = True
except Exception:  # ImportError, or fundus' own import-time failures
    fundus = None  # type: ignore
    HAVE_FUNDUS = False

DEFAULT_MAX_ARTICLES = 1000  # reference crawler.py:15 MAX_ARTICLES
DEFAULT_BATCH_SIZE = 100


def _get(obj: Any, name: str, default: Any = None) -> Any:
    out = getattr(obj, name, default)
    return default if out is None else out


def article_to_row(article: Any) -> dict:
    """Map one fundus(-like) Article object to a raw-articles row.

    Field sources mirror what the reference reads off the article
    (crawler.py:26-45): title, body.summary, body.sections
    (headline+paragraphs), lang, publishing_date, topics, authors, and
    ``article.html.source_info`` (publisher/type/url). Duck-typed — any
    object exposing the same attributes works, which is how the tests
    drive it without fundus installed.
    """
    html = _get(article, "html")
    url = _get(html, "requested_url") or _get(html, "responded_url") or _get(
        article, "url", ""
    )
    body = _get(article, "body")
    summary = list(_get(body, "summary", []) or [])
    sections = [
        {
            "headline": list(_get(sec, "headline", []) or []),
            "paragraphs": list(_get(sec, "paragraphs", []) or []),
        }
        for sec in (_get(body, "sections", []) or [])
    ]
    source_info = _get(html, "source_info")
    publishing_date = _get(article, "publishing_date")
    if publishing_date is not None and hasattr(publishing_date, "tzinfo"):
        # Spark TimestampType wants naive-or-UTC; normalize like the
        # catalog loader (UTC pin) so crawl batches agree with files.
        if publishing_date.tzinfo is not None:
            import datetime as _dt

            publishing_date = publishing_date.astimezone(
                _dt.timezone.utc
            ).replace(tzinfo=None)
    return {
        "url": str(url) if url else None,
        "title": _get(article, "title"),
        "publishing_date": publishing_date,
        "language": _get(article, "lang") or _get(article, "language"),
        "summary": summary,
        "sections": sections,
        "topics": list(_get(article, "topics", []) or []),
        "authors": list(_get(article, "authors", []) or []),
        "source_name": _get(source_info, "publisher"),
        "source_type": _get(source_info, "type"),
        "source_url": _get(source_info, "url"),
    }


def crawl(
    publishers: tuple | None = None,
    max_articles: int = DEFAULT_MAX_ARTICLES,
) -> Iterator[Any]:
    """Live article stream via fundus (reference crawler.py:19-22).

    Defaults to the reference's publisher set (DE + UK collections).
    Raises RuntimeError with install guidance when fundus is absent.
    """
    if not HAVE_FUNDUS:
        raise RuntimeError(
            "live crawling requires the optional 'fundus' package "
            "(pip install fundus); offline ingest via "
            "read_raw_articles_jsonl/parquet does not"
        )
    if publishers is None:
        publishers = (
            fundus.PublisherCollection.de,
            fundus.PublisherCollection.uk,
        )
    crawler = fundus.Crawler(*publishers)
    yield from crawler.crawl(max_articles=max_articles)


def _batches(articles: Iterable[Any], batch_size: int) -> Iterator[list[dict]]:
    batch: list[dict] = []
    for article in articles:
        batch.append(article_to_row(article))
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def articles_to_dataframe(
    spark: SparkSession, articles: Iterable[Any]
) -> DataFrame:
    """One-shot: article objects → raw-articles DataFrame (explicit
    schema, so downstream quarantine/ingest see the same types as the
    JSONL/parquet readers)."""
    rows = [article_to_row(a) for a in articles]
    return spark.createDataFrame(rows, schema=_raw_schema())


def dump_articles_jsonl(articles: Iterable[Any], path: str) -> int:
    """Scale path: persist the crawl stream as JSONL (one article per
    line, ISO timestamps) for distributed ingest via
    ``read_raw_articles_jsonl``. Returns the number of lines written."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for row in (article_to_row(a) for a in articles):
            ts = row.get("publishing_date")
            if ts is not None:
                row = dict(row, publishing_date=ts.strftime("%Y-%m-%dT%H:%M:%S"))
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    return n


def crawl_and_ingest(
    store,
    articles: Iterable[Any],
    batch_size: int = DEFAULT_BATCH_SIZE,
    rejected_root: str | None = None,
    checkpoint_every: int = 8,
    **ingest_kwargs,
):
    """End-to-end replay of the reference workflow (crawler.py:23-50):
    stream → micro-batch → quarantine → single-pass graph upsert.

    Returns ``(store, n_valid, n_rejected)``. Per-article failures never
    raise — they land in the quarantine table, the set-oriented analog
    of the reference's ``error_log.log`` append.

    Every ``checkpoint_every`` batches (and once at the end) the store
    is eagerly localCheckpointed; the batches' cached DataFrames AND
    the previous checkpoint generation's blocks are then unpersisted,
    so cached-block usage is bounded by ONE checkpoint generation (the
    live store's own tables) regardless of crawl length — asserted via
    the block manager in tests/test_crawler_app.py. Production crawls
    checkpoint to parquet instead (``store.save_atomic``), which the
    streaming foreachBatch path does.
    """
    spark = store.spark
    n_valid = n_rejected = 0
    pending: list = []
    prev_store = None

    def _flush_pending():
        nonlocal store, prev_store
        # materialize the store FIRST (cuts lineage back to the
        # checkpoint), then drop the batch caches it no longer reads
        # and the SUPERSEDED checkpoint generation's blocks (the new
        # generation was materialized from them eagerly, so nothing
        # lazy reads them anymore)
        new_store = store.localized()
        for df in pending:
            df.unpersist()
        pending.clear()
        if prev_store is not None:
            prev_store.release_checkpoints()
        prev_store = new_store
        store = new_store

    for batch in _batches(articles, batch_size):
        raw = spark.createDataFrame(batch, schema=_raw_schema())
        valid, rejected = validate_raw_articles(raw)
        valid = valid.cache()
        nv = valid.count()
        nr = len(batch) - nv
        if nr and rejected_root is not None:
            write_rejected(rejected, rejected_root)
        if nv:
            store = ingest_articles(store, valid, **ingest_kwargs)
            pending.append(valid)
        else:
            valid.unpersist()
        n_valid += nv
        n_rejected += nr
        if len(pending) >= checkpoint_every:
            _flush_pending()
    if pending:
        _flush_pending()
    return store, n_valid, n_rejected
