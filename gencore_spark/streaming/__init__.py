from .incremental import (
    incremental_exact_dedup,
    signature_stream,
    streaming_dup_counter,
)

__all__ = [
    "incremental_exact_dedup",
    "signature_stream",
    "streaming_dup_counter",
]
