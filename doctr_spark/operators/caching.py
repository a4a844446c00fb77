"""Cache-lifetime helper for operators that return persisted DataFrames.

The pair-list operators (`dedup.minhash_lsh_pairs`, `dedup.ngram_jaccard_
pairs`, `similarity.embedding_near_dups`, ...) return an EAGERLY PERSISTED
DataFrame: the expensive candidate subtree must be computed exactly once
even though the self-join downstream reads it from both sides, and the
caller may fan several consumers off the result. That leaves the cache
entry alive after consumption — harnesses clear it wholesale with
``spark.catalog.clearCache()`` between queries, but a direct caller in a
long-lived session should release it deterministically instead. ``with
consumed(op(...)) as df:`` guarantees the unpersist on block exit, errors
included.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def consumed(df: DataFrame) -> Iterator[DataFrame]:
    """Yield an operator's returned (persisted) DataFrame, unpersisting it
    when the consumer block exits — the explicit-release counterpart of the
    returned-persisted contract."""
    try:
        yield df
    finally:
        df.unpersist()
