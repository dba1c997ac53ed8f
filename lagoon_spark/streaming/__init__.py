"""Structured Streaming plane (extension beyond the reference).

The reference is batch-only — its "streaming" means constant-memory
conduit pipelines (`src/backend/src/Lagoon/Ingest/Stream.hs`; memory
cap test `clients/cmdline/test-cases/runtests.sh:64-66`). This package
adds a real streaming plane the Spark-native way: the SAME DataFrame
plan builders run over a batch scan or a ``readStream`` source, so
correctness is gated once (DuckDB oracle on the batch path) and the
streaming path is tested for parity against it.
"""

from lagoon_spark.streaming.ops import (
    read_events_stream,
    sessionize_batch,
    sessionize_stream,
    stateful_user_counts,
    windowed_event_stats,
)

__all__ = [
    "read_events_stream",
    "sessionize_batch",
    "sessionize_stream",
    "stateful_user_counts",
    "windowed_event_stats",
]
