"""Large-scale training-data pipeline operations: deduplication,
similarity search, text analysis, multimodal column plumbing.

These extend the Vector operator surface with the data-curation ops a
100 TB token-pipeline needs (BASELINE.json north rule). All are
Column-expression based (portable to a DuckDB oracle) except where a
pandas UDF is genuinely required — those are isolated and Arrow-batched.
"""
