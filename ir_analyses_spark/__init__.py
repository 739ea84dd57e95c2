"""ir_analyses_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference application Zack-K/ir_analyses (an ETL + analytics app for Japanese
corporate IR filings), re-expressed idiomatically on Spark DataFrame/SQL:

- ``etl/``       — ingest + standardization + conformance to the 4-table
                   star/EAV warehouse model (companies, financial_items,
                   financial_reports, financial_data).
- ``queries/``   — the reference's analytical read surface (financial summary,
                   time series, company list) as single DataFrame plans.
- ``ops/``       — the relational capability-closure operator library
                   (joins, aggregations, windows, set ops, top-k, scalars).
- ``streaming/`` — Structured Streaming operators over event streams.
- ``llm/``       — LLM-data-pipeline extensions: dedup (exact/minhash/simhash),
                   similarity search, text analysis, multimodal columns.

Everything is DataFrame/SQL-first: logical plans are declared, Catalyst +
Tungsten pick physical strategy; Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (Arrow-batched pandas
UDFs, never row-at-a-time in a hot path).
"""

__version__ = "0.1.0"
