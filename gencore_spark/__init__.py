"""gencore_spark — a PySpark-native near-duplicate detection + consensus
engine for web-scale text corpora.

Recasts the group-then-vote dedup model of OpenGene/gencore (reference at
/root/reference, studied — not ported) onto Common-Crawl-style web pages:
MinHash/SimHash signatures, LSH band bucketing, exact-Jaccard + LCS pair
verification, large-star/small-star connected components, and a per-cluster
consensus vote electing one canonical document.
"""

from .config import DEFAULT_CONFIG, DedupConfig
from .delta import dedup_pages_incremental
from .pipeline import DedupPipeline, dedup_pages

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "DedupConfig",
    "DedupPipeline",
    "dedup_pages",
    "dedup_pages_incremental",
]
