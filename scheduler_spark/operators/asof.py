"""As-of (temporal) join — engine add beyond the reference (§2.3 notes
"not present in the reference: as-of/interval joins"; a training-data
pipeline needs it to attach the latest-known dimension state to each
event).

Spark has no native ASOF JOIN.  The naive encoding — a range theta-join
(l.ts >= r.ts) + max-per-left — explodes to O(|L|·|R|) pairs per key
before aggregation.  This implementation uses the UNION + WINDOW
technique instead:

    union(left tagged 1, right tagged 0)
    → window per key ordered by (ts, tag)
    → last(struct(right payload), ignorenulls=True) over
      rows-unbounded-preceding   [one struct per row, so a NULL inside
      the matched row's payload is preserved, never backfilled]
    → keep left rows

Cost: ONE shuffle on the key (the window exchange) + a sort — the same
plan shape as any windowed aggregation, linear in |L|+|R|, and
AQE-partitionable.  Ordering right-before-left at equal timestamps
gives the standard backward-inclusive semantics (l.ts >= r.ts), i.e.
DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.

Determinism requires the right side to be unique per (key, ts) —
otherwise "the" row at the matched timestamp is ambiguous (DuckDB
shares this caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ts' ≤ ts within the same key group.

    Output: all left columns + every non-key/non-ts right column
    (nullable).  how='inner' drops left rows with no prior right row;
    how='left' keeps them with NULL payload.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in {*keys, ts}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    internal = {"_l", "_r", "_ts", "_side", "_matched"}
    reserved = internal & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"column names reserved by asof_join: {sorted(reserved)}")

    # The right payload travels as ONE struct, and last(ignorenulls) is
    # taken over the struct, not per column: per-column last would
    # backfill a NULL payload column from an OLDER right row — a
    # combined row that never existed — and would drop a matched left
    # row under how='inner' when the true match has all-NULL payload.
    # The struct itself is null exactly on left rows (and before any
    # right row), so struct-not-null IS the inner-match predicate, and a
    # matched row's own NULLs pass through as-is (DuckDB ASOF parity).
    l_struct_type = left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType
    r_struct_type = right.select(F.struct(*payload).alias("_r")).schema["_r"].dataType
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_type).alias("_l"),
        F.struct(*payload).alias("_r"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    matched = u.select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    ).filter(F.col("_side") == 1)
    out = matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(c) for c in payload],
        F.col("_r").isNotNull().alias("_matched"),
    )
    if how == "inner":
        out = out.filter(F.col("_matched"))
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.drop("_matched")
