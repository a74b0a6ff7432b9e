"""fashion_knowledge_graph_ray — a Ray-Data-native knowledge-graph
construction engine.

Re-expresses the query/data-processing capabilities of the
``ashleyashok/fashion-knowledge-graph`` reference (catalog attribute
extraction, embedding-based entity linking, co-occurrence edge building,
hybrid graph+vector retrieval) as a streaming ``ray.data.Dataset`` DAG over
Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Design rules (see SURVEY.md §7):
- every hot stage is ``map_batches`` over zero-copy Arrow batches;
- stateful stages (gazetteer automaton, embedding index) are actor pools
  with state built once in ``__init__``;
- the only wide shuffles are keyed on ``(src, dst, rel)`` (edges),
  ``entity_id`` (nodes) and ``(band_id, band_hash)`` (LSH blocking), each
  preceded by in-batch partial aggregation so hot keys ship one row per
  key per batch;
- nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
  session is owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
