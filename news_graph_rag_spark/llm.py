"""LLM operators (M1-M3, SURVEY §2.m): NL question → Spark SQL → answer.

The reference generates **Cypher** with Snowflake Cortex (chat.py:17-66,
llm.py:17-41) and composes the final answer from query results
(chat.py:36-44, 69-80). Here the target language is **Spark SQL over
the graph temp views**, with the same prompt structure: schema string +
linked entities + few-shot examples. The LLM client is a single
``complete(prompt) -> str`` callable — pluggable (any endpoint), with a
deterministic ``FakeLLM`` for tests; LLM generation is deliberately
outside the correctness boundary (SURVEY §7 risks).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .graph_store import GraphStore
from .ingest.ner import EntityFinder
from .retrieval.fulltext import lookup_entities

CompleteFn = Callable[[str], str]

# Few-shot examples mirroring chat.py:20-34, retargeted to Spark SQL
# over the node/edge views.
SQL_EXAMPLES = """
Example 1: Which articles mention Ursula von der Leyen?
SELECT DISTINCT a.title
FROM article a
JOIN contains c ON a.uid = c.src_uid
JOIN mentions m ON c.dst_uid = m.src_uid
JOIN person p ON m.dst_uid = p.uid
WHERE p.name IN ('Ursula von der Leyen', 'Ursula v. d. Leyn')
LIMIT 10

Example 2: How many different sources have articles mentioning the EU?
SELECT COUNT(DISTINCT s.uid) AS n_sources
FROM source s
JOIN published pb ON s.uid = pb.src_uid
JOIN contains c ON pb.dst_uid = c.src_uid
JOIN mentions m ON c.dst_uid = m.src_uid
JOIN organization o ON m.dst_uid = o.uid
WHERE o.name = 'EU'

Example 3: What is being said about France and Macron?
SELECT ch.text FROM chunk ch
JOIN mentions m ON ch.uid = m.src_uid
JOIN location l ON m.dst_uid = l.uid
WHERE l.name = 'France'
UNION
SELECT ch.text FROM chunk ch
JOIN mentions m ON ch.uid = m.src_uid
JOIN person p ON m.dst_uid = p.uid
WHERE p.name = 'Emmanuel Macron'
LIMIT 10
""".strip()

QUERY_PROMPT = """You are an expert Spark SQL developer. Generate ONE Spark SQL
query answering the user question against this news-graph schema:

{schema}

Relevant entities found in the question (uid, name, label, score):
{entities}

Follow the style of these examples:
{examples}

Question: {question}
Return only the SQL, no explanation.
""".strip()

ANSWER_PROMPT = """Answer the question using only the query results below.

Question: {question}
SQL used: {query}
Results:
{context}

Answer concisely.
""".strip()


class FakeLLM:
    """Deterministic test double: replays canned completions by
    substring match, else echoes a fallback."""

    def __init__(self, canned: dict[str, str] | None = None, fallback: str = ""):
        self.canned = canned or {}
        self.fallback = fallback
        self.prompts: list[str] = []

    def __call__(self, prompt: str) -> str:
        self.prompts.append(prompt)
        for key, completion in self.canned.items():
            if key in prompt:
                return completion
        return self.fallback


_WRITE_KEYWORDS = re.compile(
    r"(?i)^\s*(INSERT|UPDATE|DELETE|MERGE|DROP|CREATE|ALTER|TRUNCATE|"
    r"REPLACE|SET|GRANT|REVOKE|CACHE|UNCACHE|REFRESH|MSCK|ANALYZE|"
    r"ADD\s+JAR|LOAD\s+DATA)\b"
)


def assert_read_only(sql: str) -> None:
    """Reject LLM-generated statements that are not pure reads.

    The reference executes whatever Cypher the model produced
    (chat.py:71 → graph.py:238-240) against a live Neo4j — a generated
    ``MERGE``/``DELETE`` would mutate the store. Here the model's output
    is executed only if it parses as a SELECT/CTE; everything else
    raises before touching the session catalog."""
    head = sql.lstrip()
    if not head:
        raise ValueError("empty SQL from model")
    if _WRITE_KEYWORDS.match(head):
        raise ValueError(f"refusing non-read-only generated SQL: {head[:60]!r}")
    if not re.match(r"(?i)^\s*(SELECT|WITH|VALUES|TABLE|EXPLAIN)\b", head):
        raise ValueError(f"generated SQL is not a query: {head[:60]!r}")


_IDENT = r"[A-Za-z_]\w*"
_CTE_DEF = re.compile(rf"(?i)\b({_IDENT})\s+AS\s*\(")
_NOT_A_TABLE = frozenset(
    "select lateral values unnest on where group order having limit union "
    "intersect except join left right full inner cross natural using as".split()
)


def _blank_literals_and_comments(sql: str) -> str:
    """Single left-to-right scan that blanks string literals ('…' with
    '' escapes, "…") and strips ``--`` line and ``/* */`` block
    comments. One pass, because the two interact: a ``--`` inside a
    literal is text, and a ``'`` inside a comment is not a literal —
    regex-blanking literals first lets an apostrophe in a comment pair
    with a later real quote and swallow a ``FROM evil`` between them
    (round-5 ADVICE bypass). Unterminated literals/comments blank to
    end of input (fail closed); Spark's *nested* bracketed comments end
    at the first ``*/`` here, which only makes us scan text Spark would
    ignore — false-reject, never false-accept."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'" or c == '"':
            j = i + 1
            while j < n:
                if sql[j] == c:
                    if c == "'" and sql.startswith("''", j):
                        j += 2
                        continue
                    break
                j += 1
            out.append(c + c)
            i = j + 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j  # keep the newline as separator
            out.append(" ")
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _referenced_tables(sql: str) -> set[str]:
    """Best-effort extraction of table identifiers after FROM/JOIN,
    including comma-separated FROM lists. String literals and comments
    are blanked first so quoted/commented text can't fake or hide a
    keyword. Fails closed: a FROM/JOIN followed by neither an
    identifier nor ``(`` (subquery) raises — comment tricks like
    ``FROM/**/secrets`` must not extract nothing and pass."""
    s = _blank_literals_and_comments(sql)
    tables: set[str] = set()
    for m in re.finditer(r"(?i)\b(?:from|join)\b", s):
        i = m.end()
        if not re.match(rf"\s*(?:{_IDENT}|\()", s[i:]):
            raise ValueError(
                "generated SQL has FROM/JOIN followed by neither a table "
                f"name nor a subquery: {s[max(0, m.start() - 10):i + 20]!r}"
            )
        while True:
            mm = re.match(rf"\s*({_IDENT}(?:\s*\.\s*{_IDENT})*)", s[i:])
            if not mm:
                break  # subquery "FROM (" or end of clause
            name = mm.group(1)
            if name.lower() in _NOT_A_TABLE:
                break
            tables.add(re.sub(r"\s", "", name).lower())
            i += mm.end()
            am = re.match(rf"\s+(?:as\s+)?({_IDENT})", s[i:], re.I)
            if am and am.group(1).lower() not in _NOT_A_TABLE:
                i += am.end()  # skip alias
            cm = re.match(r"\s*,", s[i:])
            if not cm:
                break
            i += cm.end()
    return tables


def assert_allowed_tables(sql: str, allowed: set[str]) -> None:
    """Reject generated SQL that reads anything but the registered graph
    views.

    ``assert_read_only`` blocks DML, but Spark SQL can still read
    arbitrary storage through path-table syntax (``parquet.`/etc/x```)
    or hit other catalogs via qualified names. Registered views need no
    backticks and no qualifiers, so: ban backticks outright, then check
    every FROM/JOIN identifier against the allowlist (CTE names defined
    in the statement are implicitly allowed)."""
    if "`" in sql:
        raise ValueError("refusing backtick-quoted identifier in generated SQL")
    allowed_l = {a.lower() for a in allowed}
    ctes = {m.group(1).lower() for m in _CTE_DEF.finditer(sql)}
    for name in _referenced_tables(sql):
        if name in ctes or name in allowed_l:
            continue
        raise ValueError(f"generated SQL references unregistered table {name!r}")


def strip_sql_fences(text: str) -> str:
    """LLMs wrap SQL in ``` fences; strip them (chat.py does the same
    for Cypher via prompt discipline)."""
    t = text.strip()
    if t.startswith("```"):
        t = t.split("\n", 1)[1] if "\n" in t else t[3:]
        if t.rstrip().endswith("```"):
            t = t.rstrip()[:-3]
    return t.strip().rstrip(";")


def map_candidates_to_context(cands: list[dict]) -> str:
    """chat.py:85-90 analog: candidate dicts → prompt fragment."""
    return "\n".join(
        f"- {c['name']} ({c['label']}, uid={c['uid']}, score={c['score']:.3f})"
        for c in cands
    )


def map_records_to_context(records: list[dict], max_rows: int = 50) -> str:
    """chat.py:93-98 analog (A4 string aggregation of query results)."""
    return "\n".join(str(r) for r in records[:max_rows])


@dataclass
class GraphChat:
    """E1 lifecycle (SURVEY §3): question → entities → linked candidates
    → LLM SQL → spark.sql → LLM answer."""

    store: GraphStore
    llm: CompleteFn
    entity_finder: EntityFinder | None = None
    view_prefix: str = ""
    last: dict = field(default_factory=dict)

    def generate_sql(self, question: str) -> str:
        entities: list[str] = []
        if self.entity_finder is not None:
            entities = [name for name, _ in self.entity_finder.find(question)]
        cands: list[dict] = []
        if entities:
            cands = [r.asDict() for r in lookup_entities(self.store, entities).collect()]
        prompt = QUERY_PROMPT.format(
            schema=self.store.schema_string(),
            entities=map_candidates_to_context(cands) or "(none)",
            examples=SQL_EXAMPLES,
            question=question,
        )
        sql = strip_sql_fences(self.llm(prompt))
        self.last = {"entities": entities, "candidates": cands, "sql": sql}
        return sql

    def execute(self, sql: str) -> DataFrame:
        assert_read_only(sql)
        allowed = {self.view_prefix + name for name in self.store.tables}
        assert_allowed_tables(sql, allowed)
        self.store.register_views(self.view_prefix)
        return self.store.spark.sql(sql)

    def answer(self, question: str, max_rows: int = 50) -> str:
        sql = self.generate_sql(question)
        # Bound the collect BEFORE it reaches the driver: the model may
        # emit LIMIT-less SQL, and truncating in
        # map_records_to_context after an unbounded .collect() is a
        # driver OOM at scale. limit(max_rows + 1) keeps the
        # "(truncated)" detection — more than max_rows rows collected
        # still means the context was cut.
        records = [
            r.asDict() for r in self.execute(sql).limit(max_rows + 1).collect()
        ]
        prompt = ANSWER_PROMPT.format(
            question=question,
            query=sql,
            context=map_records_to_context(records, max_rows) or "(no rows)",
        )
        self.last["records"] = records
        return self.llm(prompt)
