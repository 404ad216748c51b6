"""Golden NL→SQL evaluation corpus (VERDICT r6 #5): the reference's
four ``__main__`` demo questions (chat.py:106-109), adapted to the
FIXTURES corpus's entities, run END-TO-END through the full chat chain
— question → NER → entity linking → (fake-)LLM SQL → guarded execution
→ records → (fake-)LLM answer — with the records asserted against
committed goldens.

The LLM is the deterministic FakeLLM (generation quality is outside the
correctness boundary, SURVEY §7); what these tests pin is everything
AROUND the model: the prompt contract, the read-only + table-allowlist
guards, the execution path over the graph views, and the ingest-derived
graph content the SQL reads. A regression anywhere in ingest (chunking,
NER, upserts), view registration, or the guard layer breaks a golden.

Question adaptation map (same shapes, corpus entities):
- chat.py:106 title-lookup   → q1 (publishing_date point lookup)
- chat.py:107 'titles about' → q2 (entity → 1-hop traversal, LIMIT 5)
- chat.py:108 'how many sources mention' → q3 (3-hop count-distinct)
- chat.py:109 'what do the news say about' → q4 (chunk-text retrieval)
"""

from __future__ import annotations

import datetime as dt

import pytest

from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.ingest.ner import EntityFinder, GazetteerModel
from news_graph_rag_spark.ingest.upserts import ingest_articles
from news_graph_rag_spark.llm import FakeLLM, GraphChat

from fixtures import GAZETTEER, raw_articles_df


@pytest.fixture(scope="module")
def store(spark):
    s = ingest_articles(
        GraphStore.empty(spark),
        raw_articles_df(spark),
        ner_model_factory=lambda: GazetteerModel(GAZETTEER),
    )
    s.tables = {k: v.cache() for k, v in s.tables.items()}
    return s


# Each case: (question, scripted SQL the fake LLM returns, golden rows
# as sorted tuples, canned final answer). Goldens are committed values:
# they change only if ingest semantics change — which is the point.
# The fixture's oversize paragraph folds through the reference chunker
# (greedy combine to >= min_combination_len, flush-sentence dropped,
# trailing partial group dropped — utils.py:27-38, crawler.py:94-102)
# into these two committed chunks: ~2.25 rotations each, phase-shifted,
# the second one sentence shorter because its flush trigger differed.
_ROT = (
    "Olaf Scholz remained silent in Berlin during the debate."
    "Ursula von der Leyen spoke about the European Union budget."
    "The address covered climate policy and enlargement."
    "Emmanuel Macron responded from France with his own proposal."
)
_SCHOLZ_LONG_A = (
    _ROT * 2 + "Olaf Scholz remained silent in Berlin during the debate."
    "Ursula von der Leyen spoke about the European Union budget"
)
_ROT_B = (
    "Ursula von der Leyen spoke about the European Union budget."
    "The address covered climate policy and enlargement."
    "Emmanuel Macron responded from France with his own proposal."
    "Olaf Scholz remained silent in Berlin during the debate."
)
_SCHOLZ_LONG_B = (
    _ROT_B * 2 + "Ursula von der Leyen spoke about the European Union budget."
    "The address covered climate policy and enlargement"
)

CASES = [
    (
        'When was the article with the title "EU summit: von der Leyen '
        'outlines budget" published?',
        "SELECT a.publishing_date FROM article a "
        "WHERE a.title = 'EU summit: von der Leyen outlines budget'",
        [(dt.datetime(2024, 5, 1, 12, 0),)],
        "It was published on 2024-05-01 at 12:00.",
    ),
    (
        "List 5 article titles about Emmanuel Macron",
        "SELECT DISTINCT a.title FROM article a "
        "JOIN contains c ON a.uid = c.src_uid "
        "JOIN mentions m ON c.dst_uid = m.src_uid "
        "JOIN person p ON m.dst_uid = p.uid "
        "WHERE p.name = 'Emmanuel Macron' ORDER BY a.title LIMIT 5",
        [
            ("EU summit: von der Leyen outlines budget",),
            ("France and Macron: a profile",),
        ],
        "Two articles: the EU summit piece and the Macron profile.",
    ),
    (
        "How many sources mention the European Union?",
        "SELECT COUNT(DISTINCT s.uid) AS n_sources FROM source s "
        "JOIN published pb ON s.uid = pb.src_uid "
        "JOIN contains c ON pb.dst_uid = c.src_uid "
        "JOIN mentions m ON c.dst_uid = m.src_uid "
        "JOIN organization o ON m.dst_uid = o.uid "
        "WHERE o.name = 'European Union'",
        [(1,)],
        "One source mentions the European Union.",
    ),
    (
        "What do the news have to say about Olaf Scholz?",
        "SELECT DISTINCT ch.text FROM chunk ch "
        "JOIN mentions m ON ch.uid = m.src_uid "
        "JOIN person p ON m.dst_uid = p.uid "
        "WHERE p.name = 'Olaf Scholz' ORDER BY ch.text LIMIT 10",
        [
            ("Olaf Scholz commented from Berlin.",),
            (_SCHOLZ_LONG_A,),
            (_SCHOLZ_LONG_B,),
        ],
        "He stayed silent in Berlin during the budget debate, later "
        "commenting from Berlin.",
    ),
]


@pytest.mark.parametrize(
    "question,sql,golden,final", CASES, ids=["q1", "q2", "q3", "q4"]
)
def test_reference_demo_questions_end_to_end(store, question, sql, golden, final):
    llm = FakeLLM(
        canned={
            "Generate ONE Spark SQL": f"```sql\n{sql}\n```",
            "Answer the question": final,
        }
    )
    chat = GraphChat(
        store=store,
        llm=llm,
        entity_finder=EntityFinder(GazetteerModel(GAZETTEER)),
    )
    answer = chat.answer(question)
    assert answer == final
    # the generated SQL survived both guards and executed; the records
    # the answer prompt saw equal the committed goldens
    records = sorted(tuple(r.values()) for r in chat.last["records"])
    assert records == sorted(golden)
    # the answer prompt actually carried the executed SQL and results
    answer_prompts = [p for p in llm.prompts if "Results:" in p]
    assert answer_prompts and sql in answer_prompts[-1]


def test_golden_chunks_carry_both_chunker_quirks(store):
    """The q4 goldens encode the reference chunker's two documented
    quirks (utils.py:27-38, crawler.py:94-102): the long fixture
    paragraph folds into exactly two greedy chunks whose sentence sets
    OVERLAP but differ in rotation, because the flush-triggering
    sentence is dropped and the trailing partial group is dropped. If
    the chunker drifts, these goldens move first."""
    texts = {
        r["text"]
        for r in store["chunk"].filter(
            store["chunk"].text.contains("Olaf Scholz")
        ).collect()
    }
    assert _SCHOLZ_LONG_A in texts and _SCHOLZ_LONG_B in texts
