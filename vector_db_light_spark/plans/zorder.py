"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a table by a single column gives min/max file statistics that prune
scans on THAT column only; interleaving the bits of two (or more) bucketed
dimensions into one sort key gives every file a bounded range in BOTH
dimensions, so a 2-D range predicate can skip files on either. This is the
write-time clustering trick behind Delta/Iceberg OPTIMIZE ZORDER — here
expressed as a pure Catalyst column so any `df.sort(zkey).write` picks it
up with no engine support.

The key is write-path machinery: computing it is a narrow projection; the
sort it feeds is the usual write-side repartition/sort. Query-side nothing
changes — parquet min/max stats on the physical layout do the pruning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = x bit i, bit 2i+1 = y bit i. Callers bucket the raw
    dimensions into [0, 2^bits) first (e.g. ``col % 256``)."""
    out: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(
            F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        nxt = xb.bitwiseOR(yb)
        out = nxt if out is None else out.bitwiseOR(nxt)
    return out
