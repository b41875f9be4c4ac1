"""Declared driver queries. Importing this package populates
``fts_analysis_datalake_spark.registry.REGISTRY`` (side-effect imports).

Each module covers one tranche of SURVEY.md §2.
"""

from fts_analysis_datalake_spark.queries import relational_core  # noqa: F401
from fts_analysis_datalake_spark.queries import scalar_functions  # noqa: F401
from fts_analysis_datalake_spark.queries import windows_dedup  # noqa: F401
from fts_analysis_datalake_spark.queries import joins_sets  # noqa: F401
from fts_analysis_datalake_spark.queries import advanced_agg  # noqa: F401
from fts_analysis_datalake_spark.queries import llm_text  # noqa: F401
from fts_analysis_datalake_spark.queries import llm_vectors  # noqa: F401
from fts_analysis_datalake_spark.queries import llm_dedup  # noqa: F401
from fts_analysis_datalake_spark.queries import streaming_sources  # noqa: F401
from fts_analysis_datalake_spark.queries import coverage_gaps  # noqa: F401
from fts_analysis_datalake_spark.queries import tpch_suite  # noqa: F401
from fts_analysis_datalake_spark.queries import cdc_history  # noqa: F401
from fts_analysis_datalake_spark.queries import scale_toolkit  # noqa: F401
from fts_analysis_datalake_spark.queries import event_analytics  # noqa: F401
from fts_analysis_datalake_spark.queries import lakehouse_ops  # noqa: F401
from fts_analysis_datalake_spark.queries import function_breadth  # noqa: F401
from fts_analysis_datalake_spark.queries import llm_curation  # noqa: F401
from fts_analysis_datalake_spark.queries import stats_models  # noqa: F401
from fts_analysis_datalake_spark.queries import ml_eval  # noqa: F401
from fts_analysis_datalake_spark.queries import sketches_search  # noqa: F401
from fts_analysis_datalake_spark.queries import advanced_models  # noqa: F401
from fts_analysis_datalake_spark.queries import prob_models  # noqa: F401
from fts_analysis_datalake_spark.queries import robust_models  # noqa: F401
from fts_analysis_datalake_spark.queries import sql_surfaces  # noqa: F401
