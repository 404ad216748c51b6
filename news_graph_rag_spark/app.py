"""Chat app surface: the reference README's "streamlit app that answers
questions about a news corpus" (reference README.md:2, chat.py:104-119),
re-hosted on the Spark-backed GraphChat chain.

Three entry points, all over the same ``GraphChat``:

* ``build_chat(...)`` — wire a GraphStore + LLM client into a chat
  chain. The LLM is pluggable (M3, llm.py CompleteFn) exactly like the
  reference's Cortex client; no provider SDK is imported here.
* ``main(argv)`` — CLI, mirroring the reference's ``__main__`` demo
  (chat.py:104-119): print the generated SQL, then the answer.
* ``run_streamlit(chat)`` — the streamlit UI, gated behind an
  import-try since streamlit isn't a hard dependency. Launch with
  ``streamlit run app.py`` from the repo root.
"""

from __future__ import annotations

import os
import sys

from .graph_store import GraphStore
from .llm import CompleteFn, FakeLLM, GraphChat


def build_chat(
    spark=None,
    graph_root: str | None = None,
    llm: CompleteFn | None = None,
    entity_finder=None,
) -> GraphChat:
    """Construct the chat chain. ``graph_root`` defaults to
    ``$NEWS_GRAPH_ROOT``; ``llm`` defaults to the echo FakeLLM so the
    app runs offline (plug a real client for production)."""
    if spark is None:
        from .session import get_spark

        spark = get_spark()
    graph_root = graph_root or os.environ.get("NEWS_GRAPH_ROOT")
    if not graph_root:
        raise ValueError(
            "graph_root required (arg or $NEWS_GRAPH_ROOT): a directory "
            "written by GraphStore.save/save_atomic"
        )
    store = GraphStore.load(spark, graph_root)
    if llm is None:
        # offline default: a canned client that emits one valid query
        # (the reference demo's LIMIT-10 shape, chat.py:25) so the app
        # runs end-to-end without any provider; plug a real
        # CompleteFn for production
        llm = FakeLLM(fallback="SELECT title FROM article LIMIT 10")
    return GraphChat(store=store, llm=llm, entity_finder=entity_finder)


def ask(chat: GraphChat, question: str) -> tuple[str, str]:
    """One turn: returns (generated_sql, answer). Mirrors the
    reference's generate_cypher_query + answer_question pair
    (chat.py:51-84) as a single call."""
    answer = chat.answer(question)
    return chat.last.get("sql", ""), answer


def _index_main(argv: list[str], spark=None) -> int:
    """Vector-index operations CLI — the DDL/ops surface of the
    persistent chunk index (reference graph.py:211-219's CREATE VECTOR
    INDEX, as commands):

      index build   <graph_root> <index_path>   build over Chunk.embedding
      index stats   <index_path>                per-list occupancy
      index search  <index_path> <chunk_uid> [k]  kNN by an indexed chunk
      index delete  <index_path> <chunk_uid>...  tombstone chunks (GDPR
                    purge path — gone from every search immediately)
      index compact <index_path>                fold tombstones into the
                    inverted lists (per-list rewrite, atomic swap)
      index split   <index_path> [centroid_id]  split the hottest (or the
                    named) inverted list in two (deterministic 2-means,
                    both tiers, hardlink-staged atomic swap)
      index merge   <index_path> [cid_a cid_b]  merge the two coldest (or
                    the named) inverted lists under the surviving id
      index retrain <index_path> [n_centroids]  GLOBAL quantizer retrain:
                    k-means over live rows, full re-assign, PQ layers
                    re-trained, one atomic swap (the slow-cadence action
                    split/merge only approximate)
      index compact-files <index_path> [centroid_id]  bin-pack appended
                    small files in every (or the named) inverted list,
                    both tiers, values unchanged
    """
    from pyspark.sql import functions as F

    from .pipeline import ann_index

    if spark is None:
        from .session import get_spark

        spark = get_spark()
    if not argv:
        print(_index_main.__doc__)
        return 2
    cmd, *rest = argv
    arity = {
        "build": (2, 2),
        "stats": (1, 1),
        "search": (2, 3),
        "delete": (2, 10_000),
        "compact": (1, 1),
        "split": (1, 2),
        "merge": (1, 3),
        "retrain": (1, 2),
        "compact-files": (1, 2),
    }
    lo_hi = arity.get(cmd)
    if lo_hi is None or not (lo_hi[0] <= len(rest) <= lo_hi[1]):
        print(_index_main.__doc__)
        return 2
    if cmd == "build":
        graph_root, index_path = rest[0], rest[1]
        store = GraphStore.load(spark, graph_root)
        chunks = store["chunk"].filter(F.col("embedding").isNotNull()).select(
            "uid", "embedding"
        )
        ann_index.build_uid_index(chunks, index_path)
        assignments, centroids, meta = ann_index.load_index(spark, index_path)
        print(
            f"built {meta['format']} over {assignments.count()} vectors, "
            f"{centroids.count()} lists -> {index_path}"
        )
        return 0
    if cmd == "stats":
        (index_path,) = rest
        assignments, _, meta = ann_index.load_index(spark, index_path)
        counts = (
            assignments.groupBy("centroid_id")
            .count()
            .orderBy("centroid_id")
            .collect()
        )
        ts = ann_index.tombstones(spark, index_path)
        n_dead = ts.count() if ts is not None else 0
        print(f"format={meta['format']} dim={meta['dim']} tombstones={n_dead}")
        for r in counts:
            print(f"list {r['centroid_id']}: {r['count']} vectors")
        return 0
    if cmd == "delete":
        index_path, *uids = rest
        n = ann_index.delete_uids(spark, index_path, uids)
        print(f"tombstoned {n} uids in {index_path} (compact to fold in)")
        return 0
    if cmd == "compact":
        (index_path,) = rest
        removed = ann_index.compact_tombstones(spark, index_path)
        print(f"compacted {index_path}: {removed} rows removed")
        return 0
    if cmd == "split":
        index_path = rest[0]
        if len(rest) > 1:
            cid = int(rest[1])
        else:  # the hottest list: max occupancy, ties to the smallest id
            assignments, _, _ = ann_index.load_index(spark, index_path)
            counts = (
                assignments.groupBy("centroid_id")
                .count()
                .collect()
            )
            if not counts:
                # an empty assignments table would otherwise raise a
                # bare ValueError out of max() (round-16 advice)
                print("index has no assigned vectors; nothing to split")
                return 2
            top = max(int(r["count"]) for r in counts)
            cid = min(
                int(r["centroid_id"]) for r in counts if int(r["count"]) == top
            )
        new_cid = ann_index.split_list(spark, index_path, cid)
        print(f"split list {cid} of {index_path}: new child list {new_cid}")
        return 0
    if cmd == "merge":
        index_path = rest[0]
        if len(rest) == 3:
            a, b = int(rest[1]), int(rest[2])
        elif len(rest) == 1:  # the two coldest lists
            assignments, _, _ = ann_index.load_index(spark, index_path)
            counts = sorted(
                (int(r["count"]), int(r["centroid_id"]))
                for r in assignments.groupBy("centroid_id").count().collect()
            )
            if len(counts) < 2:
                # covers 0 rows (empty assignments) and a single list
                # alike (round-16 advice: the 0-row state crashed in
                # min()/sorted() instead of this clean exit)
                print("need at least two non-empty lists to merge")
                return 2
            a, b = counts[0][1], counts[1][1]
        else:
            print(_index_main.__doc__)
            return 2
        keep = ann_index.merge_lists(spark, index_path, a, b)
        print(f"merged lists {a}+{b} of {index_path} into list {keep}")
        return 0
    if cmd == "retrain":
        index_path = rest[0]
        n_centroids = int(rest[1]) if len(rest) > 1 else None
        n = ann_index.retrain_quantizer(
            spark, index_path, n_centroids=n_centroids
        )
        print(f"retrained {index_path}: {n} lists over live rows")
        return 0
    if cmd == "compact-files":
        index_path = rest[0]
        cid = int(rest[1]) if len(rest) > 1 else None
        removed = ann_index.compact_list_files(
            spark, index_path, centroid_id=cid
        )
        print(f"compacted files in {index_path}: {removed} files removed")
        return 0
    if cmd == "search":
        index_path, uid = rest[0], rest[1]
        k = int(rest[2]) if len(rest) > 2 else 5
        # uid -> surrogate vec_id with the same hash the build used;
        # uid translation itself lives in ONE place
        # (ann_index.search_uids_by_id), shared with library callers
        vec_id = spark.range(1).select(
            F.xxhash64(F.lit(uid)).alias("h")
        ).first()["h"]
        rows = ann_index.search_uids_by_id(
            spark, index_path, int(vec_id), k=k
        ).collect()
        for r in rows:
            print(f"{r['rnk']:3d}  {r['uid']}  dot={r['dot']}")
        return 0
    print(_index_main.__doc__)
    return 2


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(
            "usage: python -m news_graph_rag_spark.app <question...>\n"
            "       python -m news_graph_rag_spark.app index "
            "build|stats|search ..."
        )
        return 2
    if argv[0] == "index":
        return _index_main(argv[1:])
    question = " ".join(argv)
    chat = build_chat()
    sql, answer = ask(chat, question)
    print(sql)
    print(answer)
    return 0


def run_streamlit(chat: GraphChat | None = None) -> None:
    """Streamlit chat page: question box → generated SQL (expander) →
    answer. Requires ``pip install streamlit`` (optional dep)."""
    try:
        import streamlit as st
    except Exception as exc:  # pragma: no cover - streamlit not in CI
        raise RuntimeError(
            "the chat UI requires the optional 'streamlit' package; "
            "use main()/ask() for the CLI surface"
        ) from exc

    st.title("News graph chat")
    if chat is None:  # pragma: no cover - UI wiring only
        if "chat" not in st.session_state:
            st.session_state.chat = build_chat()
        chat = st.session_state.chat
    question = st.chat_input("Ask about the news corpus")
    if question:  # pragma: no cover - UI wiring only
        with st.chat_message("user"):
            st.write(question)
        sql, answer = ask(chat, question)
        with st.chat_message("assistant"):
            with st.expander("Generated SQL"):
                st.code(sql, language="sql")
            st.write(answer)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
