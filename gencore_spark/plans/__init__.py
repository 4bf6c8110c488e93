from .inspect import (
    arrow_eval_count,
    explain_str,
    has_broadcast_join,
    scan_read_columns,
)

__all__ = [
    "arrow_eval_count",
    "explain_str",
    "has_broadcast_join",
    "scan_read_columns",
]
