"""Event-time windowed aggregation (beyond-reference extension).

The reference has no streaming surface (SURVEY §2.10); the engine adds
Structured-Streaming-ready shapes over the ``events`` table. Every
transform here is written against a plain DataFrame so the SAME function
body serves batch (``spark.read``) and streaming (``spark.readStream``)
inputs — the Structured Streaming contract.
"""

from .windows import sessionize, sliding_counts, tumbling_agg

__all__ = ["sessionize", "sliding_counts", "tumbling_agg"]
