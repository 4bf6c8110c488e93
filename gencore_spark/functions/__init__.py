"""Pure-python/numpy kernels (no Spark imports) + their golden contracts.

Spark-facing vectorized UDF wrappers live in
:mod:`gencore_spark.functions.udfs` so these kernels stay importable and
testable without a JVM.
"""

from .minhash import band_hashes, minhash_many, minhash_signature, perm_params
from .shingle import gram_hashes, shingle_hashes
from .simhash import hamming64, simhash, simhash_many
from .similarity import containment, jaccard, jaccard_texts, lcs_length
from .textnorm import extract_text, normalize_for_shingling

__all__ = [
    "band_hashes",
    "containment",
    "extract_text",
    "gram_hashes",
    "hamming64",
    "jaccard",
    "jaccard_texts",
    "lcs_length",
    "minhash_many",
    "minhash_signature",
    "normalize_for_shingling",
    "perm_params",
    "shingle_hashes",
    "simhash",
    "simhash_many",
]
