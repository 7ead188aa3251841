"""Scalar / vector / hashing function library (SURVEY.md §2.3).

Thin, named wrappers over built-in ``pyspark.sql.functions`` so every
expression stays JVM-side inside whole-stage codegen.  No row-at-a-time
Python UDFs live here.
"""

from event_streaming_spark.functions.numeric import exact_avg, exact_sum  # noqa: F401
from event_streaming_spark.functions.hashing import stable_hash32, shingles  # noqa: F401
