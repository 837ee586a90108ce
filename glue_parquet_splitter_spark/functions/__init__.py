"""Expression-level function library (all JVM-side Column builders).

Reusable pieces of the operator library for composing new queries:
vector math, hashing families, shingling, LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import lsh_bands, minhash_signatures, shingles, simhash16
from ..operators.similarity import (
    cosine, dot, l2_norm, signbit_bucket, with_norm,
)


def tokens_of(text_col) -> F.Column:
    """Whitespace tokenization as an array column."""
    return F.split(text_col if not isinstance(text_col, str) else F.col(text_col), " ")


def content_sample_pred(cols: list, rate_hex: str = "1999") -> F.Column:
    """Deterministic sampling predicate: md5-prefix of the key columns
    below a hex threshold (~rate_hex/0xffff of rows). Stable across
    engines, runs and partitionings — used by ``deterministic_sample``.
    NULL-propagating concat ('-' separated), matching SQL ``||``."""
    parts: list = []
    for c in cols:
        if parts:
            parts.append(F.lit("-"))
        parts.append(F.col(c).cast("string"))
    return F.substring(F.md5(F.concat(*parts)), 1, len(rate_hex)) < rate_hex


__all__ = ["cosine", "dot", "l2_norm", "with_norm", "signbit_bucket",
           "shingles", "minhash_signatures", "lsh_bands", "simhash16",
           "tokens_of", "content_sample_pred"]
