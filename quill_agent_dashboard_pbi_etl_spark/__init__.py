"""quill_agent_dashboard_pbi_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL service
(theHaruspex/quill-agent-dashboard-pbi-etl): webhook-event normalization into a
star schema (FactEvent + 4 dims), within-batch and cross-request deduplication,
roster gating, dimension maintenance, and the dashboard analytic layer the
reference delegates to Power BI/DAX — all re-expressed as declarative Spark
DataFrame plans so Catalyst/Tungsten pick the physical strategy.

Beyond reference parity, the engine ships the LLM-training-data operators a
100 TB pipeline needs: exact and near-duplicate detection (MinHash/LSH, SimHash,
n-gram Jaccard), embedding similarity search, multimodal column plumbing and
text analysis.

Design stance (SURVEY.md §7): batch-first DataFrame pipeline; identical
transformation graph reused by Structured Streaming ``foreachBatch``; zero
Python UDFs in reference-parity paths; Pandas UDFs only where vectorized Python
is idiomatic (embeddings, multimodal).
"""

__version__ = "0.1.0"
