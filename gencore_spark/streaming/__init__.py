from .incremental import incremental_exact_dedup, signature_stream

__all__ = ["incremental_exact_dedup", "signature_stream"]
