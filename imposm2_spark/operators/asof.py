"""J9: as-of (nearest-timestamp) join — union-tag + one keyed window pass.

Graft addition (SURVEY.md J9). Spark has no native as-of join; the naive
formulation — an inequality join `l.key = r.key AND r.ts <= l.ts` followed by
a per-left max — plans as a broadcast-nested-loop (or an O(n_l * n_r)-per-key
sort-merge range join) and is fatal at 10^12 events. This operator instead:

  1. tags both inputs (`__side` 0 = right, 1 = left) and unions them into one
     frame carrying the key columns, the event timestamp, a right-payload
     struct (null on left rows) and a left-payload struct (null on right rows);
  2. runs ONE window pass partitioned by the join key, ordered by
     (ts, side, tiebreak), taking `last(right_payload, ignorenulls=True)` over
     the unbounded-preceding frame — each left row sees exactly the most
     recent right row at-or-before it (direction="backward"; "forward" flips
     the timestamp ordering to pick the earliest right row at-or-after);
  3. filters back to left rows and null-outs matches older than `tolerance_us`.

Cost shape: one hash exchange on the key + one sort — identical to a single
groupBy over the combined stream, independent of match fan-out. Right rows at
equal (key, ts) are resolved deterministically: the greatest `tiebreak` value
wins in both directions.

Skew: with `bucket_us=None` the window partitions by the join key, so one
pathologically hot key (say, 1% of 10^12 events on a single key) serializes
into one task — the same bound any per-key-ordered semantics has. Passing
`bucket_us` (a time-bucket width in microseconds) breaks that bound: both
sides are additionally keyed by `floor(event_micros / bucket_us)`, the window
runs per (key, bucket) — so a hot key's rows spread over as many tasks as it
spans buckets — and left rows whose bucket holds no at-or-before right row
are resolved by a second, tiny union+window pass over ONE representative
right row per (key, bucket) (the bucket's nearest-to-boundary right), carried
across buckets in the match direction. Output is IDENTICAL to the unbucketed
operator for every bucket width — including null keys and null timestamps —
(property-tested in tests/test_asof.py); the price is two extra passes over
the union (the probe distinct and the representative row_number window, both
exchanging on (key, bucket)), one window over the tiny carried frame (≤ one
row per key×bucket per side), and a null-safe join-back.

Semantics are pinned against a brute-force window-SQL oracle (DuckDB) in the
driver row `asof_join_clicks_views` and against an in-test pandas brute force
in tests/test_asof.py (equal-ts inclusivity, tolerance boundary, no-match
nulls, multi-key, both directions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
    bucket_us: int | None = None,
) -> DataFrame:
    """Join each left row to the nearest right row on the same key.

    direction="backward": nearest right with right_ts <= left_ts (inclusive).
    direction="forward":  nearest right with right_ts >= left_ts (inclusive).

    Null timestamps follow SQL comparison semantics (DuckDB ASOF JOIN
    behaves the same): a right row with a null timestamp never matches
    anything; a left row with a null timestamp is emitted unmatched.

    tolerance_us: if set, matches farther than this many microseconds from the
    left timestamp are nulled out (the left row is still emitted — this is a
    LEFT join; unmatched rows carry null right columns).

    bucket_us: if set, partitions the ordering window by (key, time bucket of
    this width in microseconds) instead of key alone — the hot-key skew
    mitigation (module docstring). Result is identical for any width; pick a
    width that splits the hottest key into roughly cluster-parallelism many
    buckets (e.g. a day of events per bucket).

    tiebreak: right column deciding ties among right rows sharing (key, ts);
    the greatest value wins. Defaults to a deterministic hash of the right
    payload so equal-ts duplicates never make the output order-dependent.

    Returns all left columns, then the matched right timestamp as
    f"{right_ts}{suffix}", then every non-key right column (tiebreak included)
    suffixed with `suffix`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("asof_join requires at least one key column")
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from one side")

    if bucket_us is not None and (not isinstance(bucket_us, int) or bucket_us <= 0):
        raise ValueError(f"bucket_us must be a positive int, got {bucket_us!r}")

    # "__rts" is the matched-timestamp field INSIDE the __r/__m struct: a
    # right payload column with that name would duplicate the struct field
    # and make the `__m.__rts` reads ambiguous deep in execution.
    reserved = {"__ts", "__side", "__tie", "__r", "__l", "__m", "__bkt", "__fside", "__c", "__rn", "__rts"}
    clash = reserved.intersection(left.columns).union(
        reserved.intersection(right.columns)
    )
    if clash:
        raise ValueError(f"column names {sorted(clash)} are reserved by asof_join")

    rpay_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if tiebreak is not None and tiebreak not in rpay_cols:
        raise ValueError(f"tiebreak {tiebreak!r} is not a non-key right column")
    lpay_cols = [c for c in left.columns if c not in keys and c != left_ts]

    # A suffixed right column colliding with a left output column would emit
    # duplicate names that fail only on the NEXT select — fail loudly here.
    out_left = keys + [left_ts] + lpay_cols
    out_right = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in rpay_cols]
    dupes = sorted(set(out_left).intersection(out_right))
    if dupes:
        raise ValueError(
            f"suffixed right columns {dupes} collide with left output columns; "
            f"rename them or pass a different suffix"
        )

    tie_col: Column = (
        F.col(tiebreak)
        if tiebreak is not None
        else F.xxhash64(*([F.col(c) for c in rpay_cols] or [F.lit(0)]))
    )
    r_struct = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in rpay_cols])
    # F.struct() rejects zero fields: pad an all-key left side with a dummy
    # field that is never projected back out.
    l_struct = (
        F.struct(*[F.col(c) for c in lpay_cols])
        if lpay_cols
        else F.struct(F.lit(0).alias("__pad"))
    )
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    # Keep the tiebreak's OWN type (a long cast would null out string/decimal
    # tiebreaks and silently de-determinize tie resolution).
    tie_type = right.select(tie_col.alias("t")).schema["t"].dataType

    # A null right timestamp satisfies neither right_ts <= left_ts nor
    # right_ts >= left_ts (SQL comparison semantics), so such rows can never
    # match — drop them BEFORE the union. Left unfiltered, a null-ts right
    # sorts NULLS FIRST under the backward ordering and becomes every
    # otherwise-unmatched left row's phantom match.
    r_tagged = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tie_col.alias("__tie"),
        r_struct.alias("__r"),
        F.lit(None).cast(l_type).alias("__l"),
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.lit(None).cast(r_type).alias("__r"),
        l_struct.alias("__l"),
    )
    both = l_tagged.unionByName(r_tagged)

    backward = direction == "backward"
    part_cols = [F.col(k) for k in keys]
    if bucket_us is not None:
        # Epoch-anchored micros of the event time, typed to whichever
        # timestamp flavor the union resolved. The bucket map must be
        # MONOTONE w.r.t. the window's __ts ordering: for instant-typed
        # (TIMESTAMP) events that order is instant order, and wall-clock
        # micros are NOT monotone across a DST fall-back — an earlier right
        # row could land in a LATER bucket than its left and silently miss
        # the match — so bucket on unix micros. TIMESTAMP_NTZ orders in
        # wall-clock space, where wall micros (timestamp_diff from the
        # epoch; unix_micros rejects NTZ) are the monotone choice.
        ts_type = both.schema["__ts"].dataType
        if isinstance(ts_type, TimestampType):
            micros = F.unix_micros(F.col("__ts"))
        else:
            epoch = F.lit("1970-01-01 00:00:00").cast(ts_type)
            micros = F.timestamp_diff("MICROSECOND", epoch, F.col("__ts"))
        # floor() rounds toward -inf, so pre-epoch timestamps bucket
        # consistently too.
        both = both.withColumn("__bkt", F.floor(micros / F.lit(int(bucket_us))))
        part_cols = part_cols + [F.col("__bkt")]

    ts_order = F.col("__ts").asc() if backward else F.col("__ts").desc()
    # At equal __ts the right row (side 0) sorts before the left row, so the
    # inclusive match sees it; among equal-ts rights, ascending __tie makes
    # last() pick the greatest tiebreak. Nulls-first keeps left rows' null
    # __tie from sorting after right rows.
    w = (
        W.partitionBy(*part_cols)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    out = both.withColumn("__m", matched).where(F.col("__side") == 1)

    if bucket_us is not None:
        # Cross-bucket fix-up: a left row whose bucket holds no at-or-before
        # (resp. at-or-after) right row takes the nearest-to-boundary right of
        # the nearest non-empty bucket in the match direction. One
        # representative per (key, bucket) — the greatest-(ts, tie) right for
        # backward, the least-ts/greatest-tie right for forward (the same row
        # the unbucketed window would pick) — then the module's own
        # union+window trick one level up: probe rows (buckets that need a
        # carry) sort BEFORE representatives within their own bucket, so
        # last(ignorenulls) over the bucket ordering sees strictly
        # earlier/later buckets only. The carried frame is ≤ one row per
        # key×bucket on each side — tiny next to the data.
        rep_order = (
            [F.col("__ts").desc(), F.col("__tie").desc_nulls_last()]
            if backward
            else [F.col("__ts").asc(), F.col("__tie").desc_nulls_last()]
        )
        w_rep = W.partitionBy(*part_cols).orderBy(*rep_order)
        reps = (
            both.where(F.col("__side") == 0)
            .withColumn("__rn", F.row_number().over(w_rep))
            .where(F.col("__rn") == 1)
            .select(*keys, "__bkt", F.lit(1).alias("__fside"), "__r")
        )
        # probe EVERY left (key, bucket) — not just the ones whose in-bucket
        # match was null. That would read `out` (the fully-windowed frame)
        # twice, re-running the main sort+window over all the data; probing
        # from the pre-window union is one cheap distinct, and carried values
        # for buckets that already matched in-bucket are simply ignored by
        # the coalesce below.
        probes = (
            both.where(F.col("__side") == 1)
            .select(*keys, "__bkt")
            .distinct()
            .withColumn("__fside", F.lit(0))
            .withColumn("__r", F.lit(None).cast(r_type))
        )
        # A null __bkt (null LEFT event time — null-ts rights are dropped
        # pre-union) may pick up a carry under the forward ordering, but the
        # null-left-ts guard below nulls the match on both paths, so the
        # identical-output contract holds without special-casing here.
        bkt_order = F.col("__bkt").asc() if backward else F.col("__bkt").desc()
        w_carry = (
            W.partitionBy(*[F.col(k) for k in keys])
            .orderBy(bkt_order, F.col("__fside").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = (
            probes.unionByName(reps)
            .withColumn("__c", F.last("__r", ignorenulls=True).over(w_carry))
            .where(F.col("__fside") == 0)
            .select(*keys, "__bkt", "__c")
        )
        # Null-SAFE equality on the join-back: window partitionBy groups null
        # keys (and the null bucket) together, so plain `=` would silently
        # drop every carried match for null-keyed or null-ts rows and break
        # the identical-output contract.
        o, c = out.alias("__o"), carried.alias("__cf")
        cond = F.lit(True)
        for k in [*keys, "__bkt"]:
            cond = cond & F.col(f"__o.{k}").eqNullSafe(F.col(f"__cf.{k}"))
        out = o.join(c, on=cond, how="left").select(
            "__o.*", F.col("__cf.__c").alias("__c")
        ).withColumn("__m", F.coalesce(F.col("__m"), F.col("__c")))

    # A null LEFT timestamp likewise matches nothing (the comparison is
    # unknown for every right row) — but under the forward ordering (desc,
    # NULLS LAST) a null-ts left row sorts after every right row and would
    # otherwise adopt the earliest one. The row is still emitted, unmatched
    # (LEFT-join contract). Applied after the bucketed coalesce so both
    # paths stay output-identical.
    out = out.withColumn(
        "__m", F.when(F.col("__ts").isNotNull(), F.col("__m"))
    )

    if tolerance_us is not None:
        # The lag must be measured in the SAME space the match order lives
        # in (the bucketing rationale above): timestamp_diff subtracts
        # wall-clock datetimes, so across a DST fall-back it reports a
        # 45-minute instant gap as -15 minutes (measured) — wrongly
        # accepting/rejecting DST-straddling matches for instant-typed
        # (TIMESTAMP) events. Diff unix micros for TIMESTAMP; NTZ compares
        # in wall-clock space, where timestamp_diff is the right measure
        # (unix_micros rejects NTZ, the common parquet event type).
        if isinstance(both.schema["__ts"].dataType, TimestampType):
            gap = lambda a, b: F.unix_micros(b) - F.unix_micros(a)  # noqa: E731
        else:
            gap = lambda a, b: F.timestamp_diff("MICROSECOND", a, b)  # noqa: E731
        lag = (
            gap(F.col("__m.__rts"), F.col("__ts"))
            if backward
            else gap(F.col("__ts"), F.col("__m.__rts"))
        )
        out = out.withColumn(
            "__m", F.when(lag <= F.lit(int(tolerance_us)), F.col("__m"))
        )

    proj = [F.col(k) for k in keys]
    proj.append(F.col("__ts").alias(left_ts))
    proj.extend(F.col(f"__l.{c}").alias(c) for c in lpay_cols)
    proj.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}"))
    proj.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rpay_cols)
    return out.select(*proj)
