"""S6: cache merge — combine multiple extract reads, last-write-wins per id.

Reference analog: imposm2's cache merge of several `--read` runs (SURVEY.md S6)
where later extracts overwrite earlier elements by osm_id. Spark expression:
unionByName + row_number over file ordinal desc — one shuffle, no KV store.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

ORD_COL = "file_ord"


def merge_extracts(extracts: list[DataFrame], key: str, ord_col: str = ORD_COL) -> DataFrame:
    """Union extracts (each must carry `ord_col`, its read order) and keep, per
    `key`, only the row from the highest-ordinal extract (last write wins).

    Ties WITHIN one extract (same key, same ordinal — a dirty re-read or
    shards unioned under one ordinal) resolve by a deterministic payload
    hash, not shuffle arrival order (review r5): without the secondary sort
    the winner could differ run to run, breaking resume/lineage determinism
    (SURVEY §2.9)."""
    if not extracts:
        raise ValueError("need at least one extract")
    unioned = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), extracts)
    # xxhash64 rejects MAP-typed columns (e.g. OSM `tags`): hash over the
    # hashable columns only — deterministic as long as any non-map column
    # distinguishes the tied rows (a map-only payload difference keeps the
    # old arrival-order behavior, documented here rather than hidden)
    hashable = [c for c, t in unioned.dtypes if not t.startswith("map<")]
    tiebreak = (
        F.xxhash64(*[F.col(c) for c in hashable]) if hashable else F.lit(0)
    )
    w = W.partitionBy(key).orderBy(F.col(ord_col).desc(), tiebreak.asc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_diff(
    base: DataFrame,
    diff: DataFrame,
    key: str,
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "delete",
    keep_tombstones: bool = False,
    allowed_ops: tuple[str, ...] | None = None,
) -> DataFrame:
    """S6b: apply an OSC-style change set to a base element table.

    Reference analog: NONE in imposm2 itself — diff/replication support
    arrived in imposm3; imposm2 re-imports and swaps (SURVEY.md §2.9, S8).
    This operator supplies that successor workflow's semantics: OSC change
    files carry create/modify/delete records per element id and version;
    applying one yields the next table state. Here:

      * `base` rows are implicitly the lowest-precedence state; `diff` rows
        carry `op_col` (create/modify/`delete_op`) and win over base at
        equal `version_col`.
      * winner per `key` = max (version, diff-beats-base, op) — the trailing
        op term only breaks (key, version) collisions WITHIN a malformed
        diff deterministically; well-formed diffs have unique (key, version).
      * a winning `delete_op` removes the id from the output entirely —
        unless `keep_tombstones=True`, which RETAINS the winning delete row
        (readers filter `op != delete_op`). Tombstones matter when diffs
        are applied incrementally across batches: without them, a later
        batch carrying a LOWER-version op for a deleted id would resurrect
        it (the id is simply absent from the new base, so any op wins).
        With monotonically increasing versions across batches — the OSM
        reality — both modes chain-compose identically
        (tests/test_merge_diff.py property test).

    Scale shape: ONE map-side-combinable aggregation (`max_by` over a struct
    — ObjectHashAggregate with partial aggregation), not a sort window: at
    10^12 elements the per-key state is one row, never a sorted run. Plan
    test asserts the single-exchange shape. Base rows missing from the diff
    stream through the same agg unchanged; no join anywhere.
    """
    if op_col not in diff.columns:
        # a missing op would union in as NULL, fail the delete comparison,
        # and silently drop every diff winner — refuse loudly instead
        raise ValueError(f"diff frame must carry an {op_col!r} column")
    for frame, name in ((base, "base"), (diff, "diff")):
        # driver-side schema checks run BEFORE the allowed_ops probe: a
        # structurally invalid frame must not cost a cluster job to reject
        if version_col not in frame.columns:
            raise ValueError(
                f"{name} frame must carry a {version_col!r} column"
            )
    if allowed_ops is not None:
        # r5 (update-loop hardening): reject a malformed change set — an op
        # outside the OSC vocabulary (or NULL) would silently act as a
        # modify (or a kept null-op row) instead of whatever the producer
        # meant; a NULL key would merge every null-id row into one winner;
        # a NULL version always loses max_by and is silently dropped. One
        # limit(1) probe on the diff side only — diffs are the small side
        # of the operator by contract.
        bad = (
            # isNull spelled out: isin() is NULL (not false) for a NULL op,
            # and where(NULL) would let the malformed row slip through
            diff.where(
                F.col(op_col).isNull()
                | ~F.col(op_col).isin(*allowed_ops)
                | F.col(key).isNull()
                | F.col(version_col).isNull()
            )
            .select(key, version_col, op_col)
            .limit(1)
            .collect()
        )
        if bad:
            r = bad[0]
            raise ValueError(
                f"apply_diff: malformed diff row ({key}={r[0]!r}, "
                f"{version_col}={r[1]!r}, op={r[2]!r}) — op must be in "
                f"allowed_ops {tuple(allowed_ops)} and {key}/{version_col} "
                "must be non-null"
            )
    if op_col not in base.columns:
        base = base.withColumn(op_col, F.lit("base"))
    b = base.withColumn("_pri", F.lit(0))
    d = diff.withColumn("_pri", F.lit(1))
    unioned = b.unionByName(d, allowMissingColumns=True)
    payload = [c for c in unioned.columns if c != key]
    winner = unioned.groupBy(key).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col(version_col), F.col("_pri"), F.col(op_col)),
        ).alias("_w")
    )
    if not keep_tombstones:
        # null-safe: a winning row with a NULL op (malformed record) must
        # NOT satisfy the delete test — dropping it would silently delete a
        # live element; it is kept and surfaces as a null-op row instead
        winner = winner.where(~F.col(f"_w.{op_col}").eqNullSafe(delete_op))
    return winner.select(
        key, *[F.col(f"_w.{c}").alias(c) for c in payload]
    ).drop("_pri")
