"""Named query catalog — the engine's public query surface.

``catalog.REGISTRY`` maps query name → (spark plan builder, oracle SQL).
``__spark_entry__.py`` exposes it to the driver; ``bench.py`` times it;
``tests/`` differentially checks it against DuckDB.
"""

from event_streaming_spark.plans.catalog import REGISTRY, register, load  # noqa: F401

# Importing these modules populates REGISTRY via @register.
from event_streaming_spark.plans import relational  # noqa: F401,E402
from event_streaming_spark.plans import events  # noqa: F401,E402
from event_streaming_spark.plans import reference_ops  # noqa: F401,E402
from event_streaming_spark.plans import llm_text  # noqa: F401,E402
from event_streaming_spark.plans import llm_similarity  # noqa: F401,E402
from event_streaming_spark.plans import relational2  # noqa: F401,E402
from event_streaming_spark.plans import llm_pipeline  # noqa: F401,E402
from event_streaming_spark.plans import relational3  # noqa: F401,E402
from event_streaming_spark.plans import events2  # noqa: F401,E402
from event_streaming_spark.plans import curation  # noqa: F401,E402
from event_streaming_spark.plans import relational4  # noqa: F401,E402
from event_streaming_spark.plans import rollups  # noqa: F401,E402
