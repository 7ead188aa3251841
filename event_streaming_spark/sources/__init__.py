"""Batch sources + the partitioned event store (SURVEY O9-O11)."""

from event_streaming_spark.sources.store import EventStore  # noqa: F401
from event_streaming_spark.sources.readers import (  # noqa: F401
    list_folder,
    load_file,
    read_events_json,
)
