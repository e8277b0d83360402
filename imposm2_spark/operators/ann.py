"""Similarity search over embedding columns (array<float>).

Graft additions for training-data pipelines (no imposm2 analog; the spatial
cousin is J5 kNN — same candidate-generation-then-exact-verify shape).

  * cosine_topk_brute — exact top-k per query: broadcast the (small) query
    set, score the full corpus, window top-k. THE baseline; also the verify
    oracle for the approximate path. Scales linearly in |corpus| x |queries|
    with zero shuffle on the corpus side (queries broadcast).
  * signature/bucketed LSH (random hyperplanes) — the 10^12-row scale path:
    corpus is bucketed once by signature; each query probes its own bucket
    plus hamming-1 neighbors, so the join touches a tiny corpus slice.
    Approximate: recall is property-tested on planted near-dups.
  * embedding_neardup_window — exact cosine near-dup pairs over a bounded
    candidate window (the verify kernel standalone, SQL-oracle-checked).

Float determinism: vectors are cast float32 -> float64 (exact) and all sums
run in array order via zip_with/aggregate, so the DuckDB oracle (list_reduce
in the same order) reproduces similarities bit-for-bit; ranks are ints.

Hyperplanes are NOT runtime-random: they derive from a fixed integer LCG
(seeded by plane/dim index) so signatures are stable across runs/sessions —
a resume/lineage requirement (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMB_DIM = 64
N_PLANES = 16


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm2(a: F.Column) -> F.Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_sim(a: F.Column, b: F.Column) -> F.Column:
    """Exact cosine similarity, sequential-sum order (oracle-parallel)."""
    return _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b))


def _as_double(col: F.Column) -> F.Column:
    return col.cast("array<double>")


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "qid",
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, rank); self-matches excluded.

    Norms are precomputed per side (O(n)), not inside the pair expression
    (O(n*q)); the sim formula dot/sqrt(qn*nn) folds in the same sequential
    order as the DuckDB oracle, so values stay bit-identical."""
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_nn", _norm2(F.col("_v")))
    q = queries.select(
        F.col(id_col).alias(query_id), _as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_qn", _norm2(F.col("_q")))
    cand = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id)).withColumn(
        "_sim", _dot(F.col("_q"), F.col("_v")) / F.sqrt(F.col("_qn") * F.col("_nn"))
    )
    w = W.partitionBy(query_id).orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank")
    )


# ---------------------------------------------------------------------------
# LSH scale path
# ---------------------------------------------------------------------------
def _hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic +-1 hyperplanes from an integer LCG (runtime-random-free)."""
    idx = np.arange(n_planes * dim, dtype=np.uint64)
    # Knuth MMIX LCG step on the flat index; sign from the top bit
    state = idx * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
    state ^= state >> np.uint64(33)
    signs = np.where((state >> np.uint64(63)) & np.uint64(1), 1.0, -1.0)
    return signs.reshape(n_planes, dim)


@F.pandas_udf(T.IntegerType())
def lsh_signature(emb: pd.Series) -> pd.Series:
    """Random-hyperplane signature: bit j = [dot(v, plane_j) > 0].

    The projection accumulates SEQUENTIALLY over dims (d=0,1,...) instead of
    BLAS matmul: matmul reorders the float sum, and the DuckDB oracle twin
    (list_reduce over [v_i * s_i] in index order) must reproduce every dot —
    and therefore every sign bit — exactly. 64 vectorized FMA passes per
    batch cost the same as the matmul at these dims."""
    planes = _hyperplanes()
    mat = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, dim)
    proj = np.zeros((mat.shape[0], planes.shape[0]), dtype=np.float64)
    for d in range(planes.shape[1]):
        proj += mat[:, [d]] * planes[:, d]
    bits = (proj > 0).astype(np.int64)
    sig = np.zeros(len(emb), dtype=np.int64)
    for j in range(planes.shape[0]):
        sig = sig * 2 + bits[:, j]
    return pd.Series(sig.astype(np.int32))


def _probe_signatures(sig: F.Column, n_planes: int = N_PLANES) -> F.Column:
    """The signature itself plus all hamming-1 neighbors (multi-probe)."""
    flips = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        # 2^b as exact double->int (shift-by-column unavailable in lambdas)
        lambda b: sig.bitwiseXOR(F.pow(F.lit(2.0), b.cast("double")).cast("int")),
    )
    return F.array_union(F.array(sig), flips)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "qid",
) -> DataFrame:
    """Approximate cosine top-k: signature-bucket join + hamming-1 multiprobe.

    At scale the corpus is signed once (16-bit signature -> 65k buckets) and
    each query joins only its ~17 probe buckets: the scored candidate set is
    |corpus| / 4k per query instead of |corpus|. Recall vs brute is property-
    tested (tests/test_ann_dedup.py) on planted near-duplicates.
    """
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
        lsh_signature(F.col(vec_col)).alias("_sig"),
    )
    # UDF output must be materialized before lambda use (Catalyst forbids
    # Python UDF references inside higher-order-function lambdas)
    q = queries.select(
        F.col(id_col).alias(query_id),
        _as_double(F.col(vec_col)).alias("_q"),
        lsh_signature(F.col(vec_col)).alias("_qsig"),
    ).select(
        query_id, "_q", F.explode(_probe_signatures(F.col("_qsig"))).alias("_sig")
    )
    cand = (
        c.join(F.broadcast(q), "_sig")
        .where(F.col(id_col) != F.col(query_id))
        .dropDuplicates([query_id, id_col])
        .withColumn("_sim", cosine_sim(F.col("_q"), F.col("_v")))
    )
    w = W.partitionBy(query_id).orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank")
    )


def embedding_neardup_window(
    corpus: DataFrame,
    threshold: float,
    window: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs over the bounded id window (oracle twin).

    Plan shape matters: the naive range predicate (b > a AND b <= a + w)
    compiles to a BroadcastNestedLoopJoin scoring |corpus|^2 pairs. Instead
    the candidate ids are GENERATED (explode of 1..window) and both sides
    attach by equi-join — two hash joins, |corpus| x window scored pairs,
    and the cosine is computed exactly once per pair."""
    pair_ids = corpus.select(
        F.col(id_col).alias("vec_a"),
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("_d"),
    ).select("vec_a", (F.col("vec_a") + F.col("_d")).alias("vec_b"))
    a = corpus.select(
        F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("_va")
    )
    b = corpus.select(
        F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("_vb")
    )
    return (
        pair_ids.join(a, "vec_a")
        .join(b, "vec_b")  # inner join drops ids past the corpus end
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 9).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def embedding_neardup_lsh(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup pairs at scale: signature-bucket self-join + exact verify."""
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
        lsh_signature(F.col(vec_col)).alias("_sig"),
    )
    counts = c.groupBy("_sig").count()
    c = c.join(
        F.broadcast(counts.where(F.col("count") <= max_bucket).drop("count")),
        "_sig",
        "left_semi",
    )
    a = c.select(F.col(id_col).alias("vec_a"), F.col("_v").alias("_va"), "_sig")
    b = c.select(F.col(id_col).alias("vec_b"), F.col("_v").alias("_vb"), "_sig")
    pairs = a.join(b, "_sig").where(F.col("vec_b") > F.col("vec_a"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine_sim(F.col("_va"), F.col("_vb")), 9).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )
