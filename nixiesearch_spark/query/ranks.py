"""Rank a small, already-limited frame without a window function.

``Window.partitionBy(F.lit(i))`` looks exchange-free, but Catalyst
constant-folds the literal partition key away and the plan degrades to a
global window — WindowExec logs "No Partition Defined ... Moving all data to
a single partition" on every query (harmless on a ≤window-row frame, noisy
in benches, and it documents a guarantee the engine doesn't have).

The window-free shape: a global ``limit(n)`` already funnels through one
partition; ``coalesce(1)`` pins that explicitly, ``sortWithinPartitions``
restores the order inside it, and ``monotonically_increasing_id()`` —
``partition_id << 33 | row_index`` evaluated in physical row order — counts
0..n-1 because the single partition has id 0. No WindowExec node, no
warning, no exchange beyond the one the limit already paid for.

Only valid on LIMITED frames (k rows); never use on an unbounded table —
that is exactly the single-partition collapse the warning is about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_limited(
    df: DataFrame, order: list, keep: list[str], alias: str = "rank", base: int = 0
) -> DataFrame:
    """``df`` (already ``.limit()``ed) → ``keep`` columns + 0-based rank
    column ``alias`` (offset by ``base``) in ``order`` sort order."""
    return (
        df.coalesce(1)
        .sortWithinPartitions(*order)
        .select(
            *keep, (F.monotonically_increasing_id() + F.lit(base)).alias(alias)
        )
    )
