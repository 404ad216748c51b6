"""M1-M3 chat loop with a deterministic FakeLLM: question → entity
linking → generated Spark SQL → execution → answer synthesis
(E1 lifecycle, chat.py analog)."""

from __future__ import annotations

import pytest

from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.ingest.ner import EntityFinder, GazetteerModel
from news_graph_rag_spark.ingest.upserts import ingest_articles
from news_graph_rag_spark.llm import FakeLLM, GraphChat, strip_sql_fences

from fixtures import GAZETTEER, raw_articles_df

QUESTION = "Which articles mention Emmanuel Macron?"
GEN_SQL = """
SELECT DISTINCT a.title
FROM article a
JOIN contains c ON a.uid = c.src_uid
JOIN mentions m ON c.dst_uid = m.src_uid
JOIN person p ON m.dst_uid = p.uid
WHERE p.name = 'Emmanuel Macron'
LIMIT 10
""".strip()


@pytest.fixture(scope="module")
def store(spark):
    s = ingest_articles(
        GraphStore.empty(spark),
        raw_articles_df(spark),
        ner_model_factory=lambda: GazetteerModel(GAZETTEER),
    )
    s.tables = {k: v.cache() for k, v in s.tables.items()}
    return s


def test_strip_sql_fences():
    assert strip_sql_fences("```sql\nSELECT 1\n```") == "SELECT 1"
    assert strip_sql_fences("SELECT 1;") == "SELECT 1"


def test_chat_end_to_end(store):
    llm = FakeLLM(
        canned={
            "Generate ONE Spark SQL": f"```sql\n{GEN_SQL}\n```",
            "Answer the question": "Two articles mention Macron.",
        }
    )
    chat = GraphChat(
        store=store,
        llm=llm,
        entity_finder=EntityFinder(GazetteerModel(GAZETTEER)),
    )
    answer = chat.answer(QUESTION)
    assert answer == "Two articles mention Macron."
    # the SQL actually executed against the graph views
    titles = {r["title"] for r in chat.execute(chat.last["sql"]).collect()}
    assert titles == {
        "EU summit: von der Leyen outlines budget",
        "France and Macron: a profile",
    }
    # entity linking fed the prompt: Macron found by NER + linked
    assert "Emmanuel Macron" in chat.last["entities"]
    assert any(c["name"] == "Emmanuel Macron" for c in chat.last["candidates"])
    # prompt carried the schema string
    assert "article (:Article)" in llm.prompts[0]


def test_execute_rejects_non_read_only_sql(spark):
    import pytest as _pytest

    from news_graph_rag_spark.llm import assert_read_only

    for bad in (
        "DROP TABLE article",
        "  insert into chunk values (1)",
        "MERGE INTO t USING s ON 1=1 WHEN MATCHED THEN DELETE",
        "SET spark.sql.shuffle.partitions=1",
        "",
        "oops not sql",
    ):
        with _pytest.raises(ValueError):
            assert_read_only(bad)
    # reads pass untouched
    for ok in (
        "SELECT 1",
        "  with x as (select 1) select * from x",
        "EXPLAIN SELECT 1",
    ):
        assert_read_only(ok)


def test_execute_rejects_unregistered_tables(store):
    """VERDICT r2 #7: read-only is not enough — generated SQL could read
    arbitrary paths via ``parquet.`/path``` table syntax or foreign
    catalogs. The allowlist restricts reads to the registered views."""
    import pytest as _pytest

    from news_graph_rag_spark.llm import FakeLLM, GraphChat, assert_allowed_tables

    chat = GraphChat(store=store, llm=FakeLLM(fallback="x"))
    for bad in (
        "SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`",
        "SELECT * FROM `article`",  # backticks never needed for views
        "SELECT * FROM other_db.article",
        "SELECT a.title FROM article a JOIN secrets s ON 1=1",
        "WITH c AS (SELECT * FROM secrets) SELECT * FROM c",
        "SELECT * FROM article, secrets",
    ):
        with _pytest.raises(ValueError):
            chat.execute(bad)
    # registered views, CTEs over them, aliases, comma lists all pass
    for ok in (
        "SELECT title FROM article",
        "WITH c AS (SELECT title FROM article) SELECT * FROM c",
        "SELECT a.title FROM article AS a JOIN chunk k ON a.uid = k.uid",
        "SELECT * FROM article a, chunk k WHERE a.uid = k.uid",
        "SELECT * FROM (SELECT title FROM article) t",
    ):
        chat.execute(ok).schema  # analyzes fine

    # unit check without a session
    assert_allowed_tables("SELECT 1", set())
