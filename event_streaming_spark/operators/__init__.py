"""Reusable relational operators (SURVEY.md §2.2 keyed-state core +
§2.5 LLM-pipeline extensions).

Each operator is a DataFrame→DataFrame transform built from built-in
functions so Catalyst owns the physical plan; the query catalog
(plans/) wraps them into named, oracle-checked queries.
"""

from event_streaming_spark.operators.dedup import (  # noqa: F401
    dedup_keep_first,
    dedup_keep_latest,
)
from event_streaming_spark.operators.joins import (  # noqa: F401
    asof_join,
    asof_join_pandas,
    bucketed_range_join,
)
