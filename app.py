"""Thin launcher for the chat UI (reference README.md:2): run with
``streamlit run app.py`` (requires the optional streamlit package and
``$NEWS_GRAPH_ROOT`` pointing at a saved GraphStore)."""

from news_graph_rag_spark.app import run_streamlit

run_streamlit()
