from .incremental import (
    incremental_exact_dedup,
    reps_band_table,
    signature_stream,
    streaming_dup_counter,
    streaming_near_dup_gate,
)

__all__ = [
    "incremental_exact_dedup",
    "reps_band_table",
    "signature_stream",
    "streaming_dup_counter",
    "streaming_near_dup_gate",
]
