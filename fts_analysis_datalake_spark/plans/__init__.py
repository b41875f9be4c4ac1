"""Physical-plan introspection & audit (SURVEY.md §4).

The engine does not build a planner — Catalyst does — but it DOES
promise plan *shapes*: pushed-down scans, broadcast dims, no
cartesian blowups, Python evaluation only on the declared UDF
surface. This package turns those promises into assertions
(tests/test_plans.py runs them over every registered query).
"""

from fts_analysis_datalake_spark.plans.audit import (  # noqa: F401
    explain_text,
    has_node,
    pushed_filters,
    python_eval_nodes,
)
