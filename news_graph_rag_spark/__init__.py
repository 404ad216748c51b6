"""news_graph_rag_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dkm1006/news-graph-rag.

The reference stores a news knowledge graph in Neo4j and queries it with
Cypher; this engine holds the same labeled property graph as Spark
DataFrames (node tables + edge tables) and executes the same query
semantics with the DataFrame / Spark SQL API, letting Catalyst + Tungsten
pick physical strategies.

Subpackages
-----------
- ``schemas``    explicit StructTypes for all node/edge tables (SURVEY §1)
- ``graph_store`` the property-graph-on-DataFrames store + views + schema
                  rendering (reference: graph.py)
- ``ingest``     chunking, NER, embedding, idempotent MERGE-style upserts
                  (reference: crawler.py, ner.py, embedding.py, graph.py)
- ``retrieval``  fuzzy fulltext entity linking, vector top-k, hybrid
                  search, retrieval+graph expansion (reference: graph.py
                  fulltext/vector indexes, vector_index.ipynb)
- ``pipeline``   large-scale training-data ops: dedup (exact/MinHash-LSH/
                  SimHash/n-gram-Jaccard/embedding), similarity search,
                  text analysis, multimodal plumbing
- ``queries``    the relational query catalog used by the correctness gate
- ``streaming``  Structured Streaming ingest wrapper (foreachBatch)
- ``llm``        pluggable LLM client (fake for tests) for NL→SQL + answer
                  synthesis (reference: chat.py, llm.py)
"""

__version__ = "0.1.0"
