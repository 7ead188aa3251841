"""event_streaming_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``chehw/event-streaming`` reference (a C events-agency: pub/sub topics of
JSON events, a timestamp-indexed event store, keyed/ordered state with
dedup + keep-latest semantics, PCRE filtering, scalar time/JSON/string
functions, and notification sinks), re-expressed idiomatically on the
Spark DataFrame/SQL API and Structured Streaming — NOT a port.

Layout (mirrors SURVEY.md §7):
  session     — SparkSession factory + JSON config loading (SURVEY D5/O8)
  functions/  — scalar & vector function library (SURVEY §2.3)
  operators/  — relational/dedup/similarity/text operators (SURVEY §2.2/2.5)
  sources/    — batch readers + the partitioned event store (SURVEY O9-O11)
  streaming/  — the events-agency API over Structured Streaming (SURVEY O1-O6)
  plans/      — the named query catalog consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
