"""Incremental ingest (Structured Streaming).

The reference is strictly batch (SURVEY.md §2.11) — its only "stream" is a
fire-and-forget Kafka notification. At 10^12-turn scale, though, transcript
tables grow continuously, so the engine exposes the stateless slice of the
pipeline (ingest → structural triple emission) as a Structured Streaming
job: new transcript files/partitions become triples exactly-once via the
streaming checkpoint. The stateful stages (matching, CC canonicalization)
run per micro-batch through the incremental plan (``maintenance.py``
drives ``plans/incremental`` from ``foreachBatch`` against a persisted
catalog), or batch over the accumulated table via the checkpoint manifest
(S17) — the reference's own incremental model.
"""

from .incremental import stream_transcript_triples  # noqa: F401
from .maintenance import compact_store, stream_kg_maintenance  # noqa: F401
