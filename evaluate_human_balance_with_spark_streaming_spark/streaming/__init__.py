"""Structured Streaming bindings.

Every pipeline in plans/ is a pure DataFrame transformation, so the
streaming story is: bind it to a streaming source, attach a sink, and
let MicroBatchExecution incrementalize — the reference's architecture
(SURVEY §3), generalized with checkpoints on every query, concurrent
multi-sink (the reference's second sink was dead code, SURVEY §2.2),
watermarked aggregates, and an applyInPandasWithState custom operator.
"""

from .runner import replay_session, run_to_memory, start_query  # noqa: F401
