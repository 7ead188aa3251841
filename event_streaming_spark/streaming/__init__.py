"""Structured-Streaming layer: the events-agency API (SURVEY O1-O6),
stateful keep-latest semantics, and streaming sinks."""

from event_streaming_spark.streaming.agency import EventsAgency, TopicContext  # noqa: F401
