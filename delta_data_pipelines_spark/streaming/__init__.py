"""Structured Streaming pipelines (SURVEY.md §2.9).

    pipeline   queue micro-batches, windows (tumbling/sliding/session),
               stream dedup, fetch pipeline with MERGE sink
    stateful   applyInPandasWithState per-key running aggregates
    rollup     continuous aggregates (windowed counts MERGEd into a
               versioned table per micro-batch)
    sketch_state  per-group KMV vocabulary sketches maintained across
               micro-batches with O(groups*k) state
"""

from .pipeline import (  # noqa: F401
    dedup_events,
    queue_stream,
    run_fetch_pipeline,
    session_event_stats,
    sliding_event_counts,
    windowed_event_counts,
)
from .exact_substr import (  # noqa: F401
    compact_exact_substr_residue,
    run_incremental_exact_substr,
)
from .rollup import run_rollup  # noqa: F401
from .stateful import running_user_totals, running_user_totals_batch  # noqa: F401
from .sketch_state import merge_sketches, run_incremental_vocab_sketch  # noqa: F401
