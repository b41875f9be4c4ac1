"""fts_analysis_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query / data-processing
capabilities of the ESCAPE-WP2 ``fts-analysis-datalake`` FTS-transfer
analysis toolkit (batch analytics over flat event records: time-window
filtering, per-link grouping, success-rate/throughput aggregation,
error top-k, time bucketing, pivot matrices), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis). See SURVEY.md for the full operator inventory.

Design rules (SURVEY.md §3-§4):
- Everything is a DataFrame transform; Catalyst plans, Tungsten runs.
- No RDDs, no driver-side collect loops, no row-at-a-time Python UDFs
  in hot paths (pandas UDFs only where built-ins can't express it).
- Every operator is usable both in batch and under Structured
  Streaming (pure DF->DF functions).
"""

from fts_analysis_datalake_spark.session import get_spark
from fts_analysis_datalake_spark.catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]
__version__ = "0.1.0"
