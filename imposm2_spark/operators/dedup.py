"""Deduplication operators for training-data pipelines.

Graft additions (no imposm2 analog; the closest reference concept is the
inserted-way anti-join P4, SURVEY.md §2.2). Four tiers:

  * exact        — md5 hash-groupBy (registered directly in plans.registry)
  * minhash_lsh  — shingle -> MinHash signature -> banded LSH self-join ->
                   exact-Jaccard verify. THE scale path for near-dup text at
                   10^12 docs: candidate generation is an equi-join on
                   (band_idx, band_key), never an all-pairs product.
  * simhash      — 32-bit majority-vote fingerprint; equal fingerprints ->
                   near-dup clusters (cheap, single groupBy).
  * ngram_jaccard— exact word-shingle Jaccard on an explicit candidate-pair
                   set (the verify kernel of minhash_lsh, exposed standalone).

All hashing is integer (rolling 31-polynomial mod 1e9+7, fixed permutation
constants below), built from JVM higher-order functions — whole-stage codegen,
no Python boundary, and bit-identical DuckDB oracle twins in plans.registry.

Scale notes (10^12 docs):
  * the LSH self-join shuffles on (band_idx, band_key); hot buckets (boiler-
    plate pages) are bounded by `max_bucket` — buckets larger than that are
    dropped (they are boilerplate clusters, better handled by the exact-dup
    pass). Truncation is not silent: `minhash_dropped_buckets` returns the
    dropped (band_idx, band_key, n_docs) rows for the same inputs, the
    no-silent-caps accounting signal.
  * signatures are 16 longs + bands 4 longs per doc — tiny vs the text.
  * verify joins texts back by id only for surviving candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import CHAR_MOD, char_hash

# fixed MinHash permutation constants: h_j(x) = (a_j * x + b_j) mod P
# (random.Random(421), a forced odd; frozen here as literals — regenerating
# them would silently re-key every stored signature)
MINHASH_P = 2_147_483_647
PERMS: tuple[tuple[int, int], ...] = (
    (1405398811, 1318097825), (1312766851, 546384608), (1859270843, 1895728960),
    (1060783121, 1428938888), (1048979941, 600572080), (696670829, 1132840846),
    (1829894313, 1769179632), (963949843, 875721043), (1283395939, 532166178),
    (809769487, 1147694537), (267364855, 607944294), (2020876781, 1552976924),
    (56309789, 683420184), (1672092085, 1060610687), (1347391875, 398850620),
    (1705409389, 1066788577),
)
N_BANDS, BAND_ROWS = 4, 4
assert N_BANDS * BAND_ROWS == len(PERMS)

SHINGLE_N = 3
_COMBINE = 8191  # token-hash combiner multiplier (shared with oracle SQL)

# minhash_lsh_pairs persists its signature frame (consumed by ~5 plan
# branches — bands, bucket counts, both verify sides, and the returned
# frame's re-executions); each invocation releases its PREDECESSOR's cache
# (the registry _KNN_PREV pattern) so repeated bench/oracle invocations pin
# one signature set, not one per call. The unpersisted predecessor stays
# recomputable through its lineage.
_SIG_PREV: list[DataFrame] = []


def token_hashes(text: F.Column) -> F.Column:
    """Per-token rolling hashes; tokens = single-space split (corpus shape)."""
    return F.transform(F.split(text, " "), char_hash)


def shingle_hashes(th: F.Column) -> F.Column:
    """Word-3-gram hashes from token hashes: ((h_i*C + h_i+1)*C + h_i+2) mod M.

    <SHINGLE_N tokens -> empty array (guarded: sequence(1, n) DESCENDS for
    n < 1, which would index element_at(th, 0) and fail)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(th) - (SHINGLE_N - 1)),
        lambda i: (
            (
                (F.element_at(th, i) * _COMBINE + F.element_at(th, i + 1)) % CHAR_MOD
            )
            * _COMBINE
            + F.element_at(th, i + 2)
        )
        % CHAR_MOD,
    )
    return F.when(F.size(th) >= SHINGLE_N, grams).otherwise(
        F.array().cast("array<long>")
    )


def minhash_signature(shs: F.Column) -> list[F.Column]:
    """16 MinHash components (duplicate shingles are harmless under min)."""
    return [
        F.array_min(F.transform(shs, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)).alias(
            f"m{j}"
        )
        for j, (a, b) in enumerate(PERMS)
    ]


def band_keys() -> list[F.Column]:
    """Collapse each band of BAND_ROWS signature components into one key."""
    out = []
    for b in range(N_BANDS):
        key = F.col(f"m{BAND_ROWS * b}")
        for r in range(1, BAND_ROWS):
            key = (key * _COMBINE + F.col(f"m{BAND_ROWS * b + r}")) % MINHASH_P
        out.append(key.alias(f"band{b}"))
    return out


def jaccard(sa: F.Column, sb: F.Column) -> F.Column:
    """Exact set-Jaccard over shingle-hash arrays, rounded for hash-compare.

    try_divide, not `/`: two EMPTY shingle sets make the union size 0, and
    plain division under Spark 4's default ANSI mode raises DIVIDE_BY_ZERO
    and aborts the job (review r5, runtime-confirmed) — the documented
    contract is NULL for the empty/empty pair, same rationale as
    ann.cosine_sim's zero-norm handling."""
    inter = F.size(F.array_intersect(F.array_distinct(sa), F.array_distinct(sb)))
    union = F.size(F.array_union(sa, sb))
    return F.round(F.try_divide(inter.cast("double"), union), 9)


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    engine: str = "arrow",
) -> DataFrame:
    """(id, shs, m0..m15, band0..band3); docs with <SHINGLE_N tokens dropped.

    engine='arrow' (default, r6 — guide §4.2): one batched mapInPandas pass
    through the NumPy twins in kernels/texthash.py. The whole chain is
    integer arithmetic, so the kernel is BIT-IDENTICAL to the interpreted
    HOF expressions (differential-tested in tests/test_texthash.py incl.
    non-ASCII and empty-token edges) while replacing O(chars + 16*shingles)
    interpreted expression evaluation per row with vectorized array math.
    engine='hof' keeps the Catalyst expression formulation (the oracle's
    textual twin, used by the differential tests)."""
    if engine == "arrow":
        return _minhash_signatures_kernel(docs, id_col, text_col)
    if engine != "hof":
        raise ValueError(f"engine must be 'arrow' or 'hof', got {engine!r}")
    th = docs.select(
        F.col(id_col), token_hashes(F.col(text_col)).alias("_th")
    ).where(F.size("_th") >= SHINGLE_N)
    sh = th.select(id_col, shingle_hashes(F.col("_th")).alias("shs"))
    sig = sh.select(id_col, "shs", *minhash_signature(F.col("shs")))
    return sig.select(id_col, "shs", *[F.col(f"m{j}") for j in range(len(PERMS))], *band_keys())


def _minhash_signatures_kernel(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Arrow engine behind minhash_signatures (see its docstring)."""
    import numpy as np
    import pandas as pd

    from ..kernels import texthash as tx

    schema = (
        f"{id_col} long, shs array<long>, "
        + ", ".join(f"m{j} long" for j in range(len(PERMS)))
        + ", "
        + ", ".join(f"band{b} long" for b in range(N_BANDS))
    )

    def gen(batches):
        for pdf in batches:
            ids, shs_out, sigs, bands = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue  # NULL text: the HOF chain's size(NULL) filter
                th = tx.token_hashes_doc(t)
                if len(th) < SHINGLE_N:
                    continue
                shs = tx.shingle_hashes_from_tokens(th)
                sig = tx.minhash_sig_from_shingles(shs)
                ids.append(int(i))
                shs_out.append(shs)
                sigs.append(sig)
                bands.append(tx.band_keys_from_sig(sig))
            if not ids:
                continue
            S = np.stack(sigs)
            B = np.stack(bands)
            d = {id_col: np.asarray(ids, dtype=np.int64), "shs": shs_out}
            for j in range(len(PERMS)):
                d[f"m{j}"] = S[:, j]
            for b in range(N_BANDS):
                d[f"band{b}"] = B[:, b]
            yield pd.DataFrame(d)

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def shingle_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    engine: str = "arrow",
) -> DataFrame:
    """(id, shs): per-doc word-3-gram shingle hashes; <SHINGLE_N-token and
    NULL-text docs dropped (the minhash_signatures row contract minus the
    signature columns).

    engine='arrow' (default, r6): batched NumPy kernel — bit-identical to
    the HOF chain (tests/test_texthash.py) at ~4x the throughput (guide
    §4.2; measured 2.17s -> 0.55s for the sf1.0 scan). engine='hof' keeps
    the Catalyst expression formulation."""
    if engine == "hof":
        return (
            docs.select(id_col, token_hashes(F.col(text_col)).alias("_th"))
            .where(F.size("_th") >= SHINGLE_N)
            .select(id_col, shingle_hashes(F.col("_th")).alias("shs"))
        )
    if engine != "arrow":
        raise ValueError(f"engine must be 'arrow' or 'hof', got {engine!r}")
    import numpy as np
    import pandas as pd

    from ..kernels import texthash as tx

    def gen(batches):
        for pdf in batches:
            ids, out = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                th = tx.token_hashes_doc(t)
                if len(th) < SHINGLE_N:
                    continue
                ids.append(int(i))
                out.append(tx.shingle_hashes_from_tokens(th))
            if ids:
                yield pd.DataFrame(
                    {id_col: np.asarray(ids, dtype=np.int64), "shs": out}
                )

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, shs array<long>"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Verified near-dup pairs: (doc_a, doc_b, jaccard), every row has
    jaccard >= threshold.

    Candidates = pairs sharing any LSH band bucket; exact Jaccard verifies.
    `max_bucket` drops degenerate boilerplate buckets (see module docstring;
    `minhash_dropped_buckets` reports what was dropped).

    RECALL CONTRACT (review r5): the output is a SUBSET of all qualifying
    pairs — LSH candidate generation is probabilistic. With the frozen
    banding (4 bands x 4 rows), P(candidate | jaccard=j) = 1-(1-j^4)^4:
    ~31% at j=0.5, ~67% at j=0.7, ~98% at j=0.9. The banding is sized for
    the near-identical crawl-mirror regime (j >= ~0.8, where recall is
    >90%); pairs in [threshold, ~0.7) are under-sampled by design — the
    scale tradeoff every banded-LSH dedup makes (more bands with fewer rows
    raise recall at low j but explode the candidate count). For exhaustive
    pairs above a low threshold use ngram_jaccard_pairs on an explicit
    candidate set instead."""
    # r6 optimization (guide §5 caching): the signature frame feeds ~5 plan
    # branches (bands explode, the bucket-count gate, BOTH verify sides, and
    # every re-execution of the returned frame) and each branch used to
    # re-run the per-char token-hash + shingle + 16-permutation chain over
    # the whole corpus — the dominant cost of this operator. Persist it once
    # per invocation (predecessor released via _SIG_PREV above; footprint =
    # id + shingle hashes + 20 longs per doc, MEMORY_AND_DISK so oversized
    # inputs spill instead of OOM). At true 10^12 scale callers materialize
    # signatures as a table instead; within one invocation this is the same
    # compute-once discipline.
    # release BEFORE persist: identical lineage across invocations shares ONE
    # CacheManager entry (semantic plan equality), so the reverse order
    # silently dropped the fresh cache (see plans/curate.py, same fix)
    while _SIG_PREV:
        _SIG_PREV.pop().unpersist()
    sig = minhash_signatures(docs, id_col, text_col).persist()
    _SIG_PREV.append(sig)
    # NOTE (r6, measured): an EAGER sig.count() here looked attractive (fill
    # the cache once before the multi-branch consumers) but benched WORSE
    # end-to-end (curate_corpus 32.6s vs 22.2s, dedup_minhash_family 7.3s vs
    # 5.1s at sf1.0) — the extra standalone job costs more than the partial
    # duplicate compute it avoids. Kept lazy deliberately.
    # band rows are (id, band_idx, band_key) ONLY — 3 longs/row. Carrying the
    # shingle arrays through the explode / self-join / dropDuplicates would
    # shuffle ~8x the corpus shingle set (thousands of longs per doc); instead
    # the shingles join back per side for surviving candidate pairs, exactly
    # the ngram_jaccard_pairs shape (all branches now read the cached
    # signatures; plan-locked in tests/test_plans).
    bands = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_idx", "band_key"
        ),
    )
    if max_bucket is not None:
        counts = bands.groupBy("band_idx", "band_key").count()
        keep = counts.where(F.col("count") <= max_bucket).drop("count")
        bands = bands.join(keep, ["band_idx", "band_key"], "left_semi")
    a = bands.select(F.col(id_col).alias("doc_a"), "band_idx", "band_key")
    b = bands.select(F.col(id_col).alias("doc_b"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b")
    )
    sh = sig.select(id_col, "shs")
    return (
        cand.join(sh.select(F.col(id_col).alias("doc_a"), F.col("shs").alias("sa")), "doc_a")
        .join(sh.select(F.col(id_col).alias("doc_b"), F.col("shs").alias("sb")), "doc_b")
        .select("doc_a", "doc_b", jaccard(F.col("sa"), F.col("sb")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dropped_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 10_000,
) -> DataFrame:
    """No-silent-caps accounting for minhash_lsh_pairs' `max_bucket` drop
    (review r5 — the module contract promised this signal): the
    (band_idx, band_key, n_docs) rows whose buckets exceed `max_bucket` and
    are therefore excluded from candidate generation. Same banding lineage
    as the pairs path, one extra hash-agg over the slim band rows — run it
    alongside a capped dedup to quantify (and alert on) what was skipped;
    an empty result proves the cap never fired."""
    sig = minhash_signatures(docs, id_col, text_col)
    bands = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_idx", "band_key"
        ),
    )
    return (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_bucket)
    )


# ---------------------------------------------------------------------------
# SimHash: 32-bit majority-vote fingerprint over token hashes.
# The oracle extracts bit b as floor(h / 2^b) % 2 (DuckDB lambdas lack
# bitwise shift-by-column); the engine uses literal bit MASKS + bitwiseAND —
# identical values because token hashes are nonnegative (< CHAR_MOD < 2^30).
# ---------------------------------------------------------------------------
SIMHASH_BITS = 32


def _bit_masks() -> F.Column:
    """One literal mask per bit: a constant array, built once per plan.
    Constructed lazily — F.lit requires an active SparkContext, so a
    module-level constant would break import before session start."""
    return F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])


def simhash_from_hashes(th: F.Column) -> F.Column:
    """SimHash from a PRECOMPUTED token-hash array column, in ONE array pass.

    Higher-order functions are interpreted (not codegen'd), and passing
    `text` directly would re-run the O(chars) rolling hash per reference —
    callers materialize the hash array in a prior projection (see
    simhash_clusters). Within this expression the token array is folded
    ONCE, zip_with-ing a 32-counter array state against literal bit masks
    (r3 verdict watch item: the previous form scanned the array once per bit
    with a float pow/floor per token-bit — measured 2.3x slower at sf0.1:
    2.32s vs 1.03s median-of-3, outputs bit-identical). The counts array is
    then bound once as a lambda variable (aggregate over a 1-element array)
    before the 32 element_at references — an unbound expression would re-run
    the whole fold per reference (the HOF re-evaluation trap, SKILL.md r3)."""
    n = F.size(th)
    counts = F.aggregate(
        th,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            _bit_masks(),
            lambda c, m: c
            + F.when(h.cast("long").bitwiseAND(m) != 0, 1).otherwise(0),
        ),
    )
    return F.aggregate(
        F.array(counts),  # binds the counts fold ONCE as a lambda variable
        F.lit(0).cast("long"),
        lambda _zero, cs: F.aggregate(
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2
            + F.when(F.element_at(cs, b.cast("int") + 1) * 2 > n, 1).otherwise(0),
        ),
    )


def simhash(text: F.Column) -> F.Column:
    """Single-column convenience form (tests); hot paths use the two-phase
    simhash_clusters plan to avoid re-hashing per bit."""
    return simhash_from_hashes(token_hashes(text))


def simhash_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    engine: str = "arrow",
) -> DataFrame:
    """Docs sharing a SimHash fingerprint — near-dup clusters in one groupBy.

    engine='arrow' (default, r6 — guide §4.2): fingerprints come from the
    batched NumPy kernel (kernels/texthash.py::simhash_from_tokens, already
    differential-tested bit-identical) instead of the interpreted 32-counter
    zip_with fold — the fold was this operator's whole scan cost. NULL text
    fingerprints as 0 on BOTH engines (the HOF outer fold over [NULL]
    counts emits 0 per bit; the kernel's empty token array does the same —
    engine-parity pytest incl. NULL rows). The groupBy shuffles
    (simhash, partial agg) either way. engine='hof' keeps the Catalyst
    formulation (the oracle's textual twin)."""
    if engine == "arrow":
        import numpy as np
        import pandas as pd

        from ..kernels import texthash as tx

        def gen(batches):
            for pdf in batches:
                fps = np.fromiter(
                    (
                        tx.simhash_from_tokens(tx.token_hashes_doc(t))
                        for t in pdf[text_col]
                    ),
                    dtype=np.int64,
                    count=len(pdf),
                )
                yield pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy(), "simhash": fps}
                )

        fp = docs.select(id_col, text_col).mapInPandas(
            gen, f"{id_col} long, simhash long"
        )
    elif engine == "hof":
        th = docs.select(F.col(id_col), token_hashes(F.col(text_col)).alias("_th"))
        fp = th.select(
            F.col(id_col), simhash_from_hashes(F.col("_th")).alias("simhash")
        )
    else:
        raise ValueError(f"engine must be 'arrow' or 'hof', got {engine!r}")
    return (
        fp.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
    use_reliable_checkpoint: bool | None = None,
    driver_max_edges: int | None = 1_000_000,
) -> DataFrame:
    """Near-dup CLUSTERS from a verified pair table: (doc_id, cluster_id)
    where cluster_id = the smallest doc id reachable through the pair graph
    (connected components).

    Min-label propagation WITH pointer doubling — a bounded driver-side plan
    loop; data never reaches the driver. Each round does (a) neighbor-min
    propagation (one equi-join + one groupBy) and (b) a doubling hop
    label <- label(label) (one self-join): labels form a pointer forest onto
    smaller ids, so path lengths halve per round and convergence takes
    O(log diameter) rounds — a diameter-10^6 chain of boilerplate pages needs
    ~20 rounds, not 10^6. Labels only decrease and are bounded below by the
    component minimum, and the fixpoint test is on the COMBINED update, so
    changed == 0 still certifies neighbor-min stability (= correct labels).
    At 10^12 docs the label frame is 2 longs/node over dup nodes only —
    orders of magnitude smaller than the corpus. Exact (oracle: recursive
    CTE transitive closure in plans.registry::dedup_minhash_clusters).

    Raises RuntimeError if `max_iterations` rounds exhaust before the
    fixpoint — silently returning under-converged (wrong) cluster ids would
    under-dedup downstream curation. With doubling, hitting the default cap
    means a component diameter around 2^25.

    driver_max_edges (optimization r6, guide §1.2 "the distributed
    algorithm" + §3.1 "broadcast the side that fits"): near-dup pair graphs
    are orders of magnitude smaller than the corpus (they hold DUP nodes
    only), and the iterative plan loop pays ~2 jobs x O(seconds) of fixed
    latency per doubling round regardless of size. When the pair table fits
    `driver_max_edges` rows (ONE bounded limit(cap+1) collect — the
    pip_join max_broadcast_polygons contract; ~16 bytes/edge, so the
    default 10^6 cap is ~mid-MB of driver memory), labels are computed with
    an exact union-find over the collected edges and parallelized back —
    identical output (min reachable id per node, pytest-pinned equal to
    the loop), zero iterative rounds. Larger graphs take the loop below
    unchanged; pass None to force the loop.

    use_reliable_checkpoint: per-round state normally lives in
    localCheckpoint blocks — fast, but lost with an executor, which fails
    the whole job on a long run. None (default) sniffs the SparkContext: if
    a checkpoint dir is set (production clusters:
    `sc.setCheckpointDir("hdfs://.../ckpt")`), rounds use reliable
    `.checkpoint()` to that dir and survive executor loss; otherwise
    localCheckpoint. True requires a checkpoint dir (ValueError if unset);
    False forces localCheckpoint either way. Results are identical across
    modes (pytest-gated).
    """
    from pyspark.sql.types import IntegerType, LongType, ShortType

    integral = all(
        isinstance(pairs.schema[c].dataType, (LongType, IntegerType, ShortType))
        for c in (a_col, b_col)
    )
    if integral and driver_max_edges is not None and driver_max_edges > 0:
        # bounded probe-and-collect in ONE action: evaluates the (possibly
        # expensive) pair lineage exactly once on the fast path; if the
        # extra row comes back the graph is big and the loop re-evaluates —
        # the rare path by construction (dup graphs are corpus-tiny).
        head = pairs.select(a_col, b_col).limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            return _cc_driver(pairs.sparkSession, head)
    sc = pairs.sparkSession.sparkContext
    ckpt_dir = sc.getCheckpointDir()
    if use_reliable_checkpoint is None:
        use_reliable_checkpoint = ckpt_dir is not None
    elif use_reliable_checkpoint and ckpt_dir is None:
        raise ValueError(
            "use_reliable_checkpoint=True requires "
            "spark.sparkContext.setCheckpointDir(...) so round state has "
            "somewhere durable to live"
        )

    def _round_checkpoint(df: DataFrame) -> DataFrame:
        if use_reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # the symmetric union reads `pairs` twice — persist it so an expensive
    # upstream (the LSH verify chain) executes once, released after edges
    # materialize. If the CALLER already cached pairs, leave their cache
    # alone (review r5: persist() on a cached frame is a no-op but
    # unpersist() is not — the old unconditional pair clobbered it)
    caller_cached = pairs.is_cached
    if not caller_cached:
        pairs = pairs.persist()
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .persist()
    )
    labels.count()
    if not caller_cached:
        pairs.unpersist()
    converged = False
    for it in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left").select(
            labels["id"],
            F.least("label", F.coalesce("nbr_label", "label")).alias("_l1"),
            F.col("label").alias("_prev"),
        )
        # pointer doubling: label values ARE node ids (initialized id->id and
        # only ever replaced by smaller existing labels), so label(label)
        # resolves through the same frame and shortcuts chains geometrically.
        # Round 0 skips the hop — labels are still the identity map, so
        # label(label) is a no-op join.
        if it == 0:
            new_labels = _round_checkpoint(
                stepped.withColumnRenamed("_l1", "label")
            )
            changed = new_labels.where(F.col("label") != F.col("_prev")).count()
            # NO _release_local_checkpoint here: round-0 `labels` is the
            # initial persist()ed frame whose plan may embed the CALLER's
            # checkpointed input (e.g. a localCheckpoint'ed pairs frame) —
            # walking it would unpersist caller-owned blocks. Rounds >= 1
            # only ever see our own checkpoint as the plan leaf.
            labels.unpersist()
            labels = new_labels.drop("_prev")
            if changed == 0:
                converged = True
                break
            continue
        hop = labels.select(F.col("id").alias("_hid"), F.col("label").alias("_hlabel"))
        # checkpoint (not persist): each round references `labels` TWICE,
        # so lineage doubles per round — caching truncates execution but not
        # the logical plan, and Catalyst's tree walk OOMs around round 10.
        # An eager checkpoint materializes the round AND cuts the plan to a
        # LogicalRDD; _round_checkpoint picks local vs reliable per the
        # use_reliable_checkpoint contract above.
        new_labels = (
            stepped.join(hop, stepped["_l1"] == hop["_hid"], "left")
            .select(
                "id",
                F.least("_l1", F.coalesce("_hlabel", "_l1")).alias("label"),
                "_prev",
            )
        )
        new_labels = _round_checkpoint(new_labels)
        changed = new_labels.where(F.col("label") != F.col("_prev")).count()
        labels.unpersist()
        if not use_reliable_checkpoint:
            # local-checkpoint blocks need the explicit rdd release
            _release_local_checkpoint(labels)
        else:
            # superseded reliable checkpoint: delete its files, keep only the
            # latest round's (rounds >= 1 only ever see our own checkpoint as
            # the plan leaf — round 0's frame is caller-owned, same contract
            # as the local-release rule above)
            _delete_reliable_checkpoint(labels)
        labels = new_labels.drop("_prev")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dedup_connected_components did not converge in {max_iterations} "
            "rounds (component diameter ~2^rounds with pointer doubling); "
            "raise max_iterations rather than consuming under-merged clusters"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def _cc_driver(spark, edge_rows) -> DataFrame:
    """Exact union-find over a bounded, collected edge list — the small-graph
    engine behind dedup_connected_components(driver_max_edges=...). Returns
    (doc_id, cluster_id) for every node appearing in the edges, cluster_id =
    the smallest id reachable through the pair graph — byte-identical to the
    distributed loop's contract (pytest-pinned)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    rows = sorted((node, comp_min[find(node)]) for node in parent)
    # 1 slice: a parallelize over default parallelism would schedule ~32
    # near-empty tasks for a frame this small (bounded by driver_max_edges)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, len(rows) // 500_000 + 1)),
        "doc_id long, cluster_id long",
    )


def _delete_reliable_checkpoint(df: DataFrame) -> None:
    """Delete the checkpoint FILES a reliably-checkpointed frame owns.

    Reliable round checkpoints are durable by design, but each round
    supersedes the last: without explicit deletion a 20-round CC run leaves
    ~20 full label-frame copies under the checkpoint dir (Spark only
    auto-cleans with spark.cleaner.referenceTracking.cleanCheckpoints=true,
    default false). Called on the SUPERSEDED round only — the latest
    checkpoint backs the returned DataFrame and is kept. Best-effort."""
    try:
        sc = df.sparkSession.sparkContext
        jvm = sc._jvm
        plans = [df._jdf.logicalPlan()]
        while plans:
            p = plans.pop()
            if p.getClass().getSimpleName() == "LogicalRDD":
                opt = p.rdd().getCheckpointFile()
                if opt.isDefined():
                    path = jvm.org.apache.hadoop.fs.Path(opt.get())
                    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
                    fs.delete(path, True)
                continue
            kids = p.children()
            for i in range(kids.size()):
                plans.append(kids.apply(i))
    except Exception:
        pass  # leak is bounded by run length; never fail the caller


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the executor storage a localCheckpoint'ed frame holds.

    Dataset.unpersist() only clears CacheManager entries; the checkpoint's
    RDD-level persist needs an explicit RDD.unpersist (measured: persistent-
    RDD count drops to 0 with this, stays 1 without). Walks the logical plan
    to the LogicalRDD leaf (the frame in the loop is a projection over it).
    Best-effort: never fails the caller."""
    try:
        plans = [df._jdf.logicalPlan()]
        while plans:
            p = plans.pop()
            if p.getClass().getSimpleName() == "LogicalRDD":
                p.rdd().unpersist(False)
                continue
            kids = p.children()
            for i in range(kids.size()):
                plans.append(kids.apply(i))
    except Exception:
        pass  # storage falls back to ContextCleaner GC


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Exact word-shingle Jaccard for an explicit candidate-pair table.

    Pairs referencing a doc with < SHINGLE_N tokens keep the empty-shingle
    semantics (jaccard 0.0, or null when both sides are empty) — no rows are
    dropped relative to the caller's pair table."""
    # token hashes bound ONCE via the single-element-array transform trick
    # (see curation.text_ngram_hashes): shingle_hashes references its input
    # ~5x inside interpreted lambdas (no CSE), so inlining token_hashes there
    # re-runs the per-char fold per reference — measured 25x slower at sf0.1.
    sh = docs.select(
        F.col(id_col),
        F.element_at(
            F.transform(
                F.array(token_hashes(F.col(text_col))),
                lambda th: shingle_hashes(th),
            ),
            1,
        ).alias("shs"),
    )
    return (
        pairs.join(sh.select(F.col(id_col).alias(a_col), F.col("shs").alias("sa")), a_col)
        .join(sh.select(F.col(id_col).alias(b_col), F.col("shs").alias("sb")), b_col)
        .select(a_col, b_col, jaccard(F.col("sa"), F.col("sb")).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# T27: exact substring-level dedup (fixed-stride block form)
# ---------------------------------------------------------------------------
DUP_BLOCK_LEN = 20
DUP_BLOCK_FRAC_MAX = 0.5


def substring_block_metrics(
    docs: DataFrame,
    block_len: int = DUP_BLOCK_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_frac: float = DUP_BLOCK_FRAC_MAX,
) -> DataFrame:
    """T27 exact substring dedup metrics (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", fixed-stride block form).

    The suffix-array formulation of exact substring dedup doesn't distribute;
    the standard cluster-scale approximation is content blocks at a fixed
    stride: split each doc into non-overlapping `block_len`-char blocks
    (trailing remainder ignored), call a block DUPLICATED iff its exact
    content occurs >= 2 times corpus-wide (within- or cross-document), and
    score each doc by its duplicated-block fraction. Returns one row per
    input doc: (id, n_blocks, n_dup_blocks, dup_frac, keep) with
    dup_frac = round(n_dup_blocks / max(n_blocks, 1), 6) and
    keep = dup_frac <= max_frac evaluated on the ROUNDED value (bit-exact
    vs the DuckDB oracle twin in plans.registry). Docs shorter than
    `block_len` have n_blocks = 0, dup_frac = 0.0, keep = true.

    Scale shape (10^12 docs): block enumeration is an in-row
    sequence+explode (no shuffle); duplicate detection is ONE map-side-
    combinable hash-agg keyed by block content (hot boilerplate blocks
    arrive pre-combined per map task, so a 10^9-occurrence block is not a
    straggler); attribution is a left-semi equi-join of the block stream
    against the >=2 keys plus one narrow per-doc count agg. Shuffle bytes
    ~ corpus bytes / 1 — the linear cost any exact-content pass pays; for
    narrower shuffle rows key the agg+join by xxhash64(block) instead of
    the string (collision risk ~ n^2/2^64; kept content-keyed here so the
    semantics are exactly the oracle's). All expressions JVM-side, zero
    Python crossings."""
    base = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.floor(F.length(text_col) / block_len).cast("long").alias("n_blocks"),
    )
    blocks = (
        base.where(F.col("n_blocks") > 0)
        .select(
            id_col,
            F.col("_t"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_blocks") - 1)
            ).alias("_p"),
        )
        .select(
            id_col,
            F.col("_t")
            .substr((F.col("_p") * block_len + 1).cast("int"), F.lit(block_len))
            .alias("block"),
        )
    )
    dup_keys = (
        blocks.groupBy("block")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= 2)
        .select("block")
    )
    per_doc = (
        blocks.join(dup_keys, "block", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_blocks"))
    )
    dup_frac = F.round(
        F.col("n_dup_blocks") / F.greatest("n_blocks", F.lit(1)), 6
    )
    return (
        base.select(id_col, "n_blocks")
        .join(per_doc, id_col, "left")
        .withColumn("n_dup_blocks", F.coalesce("n_dup_blocks", F.lit(0)))
        .withColumn("dup_frac", dup_frac)
        .withColumn("keep", F.col("dup_frac") <= max_frac)
    )
