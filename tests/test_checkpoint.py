"""M6 resume tests (SURVEY.md §5.2.6): skip-completed restart, invalidation,
partial-write recovery, lineage + per-partition metrics."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from imposm2_spark.plans.checkpoint import MANIFEST, TMP_SUFFIX, CheckpointManager, fingerprint_of

pytestmark = pytest.mark.spark


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def _run_pipeline(spark, root, calls, fp="v1"):
    """Two-stage pipeline; `calls` records which stage builders actually ran."""
    mgr = CheckpointManager(root)

    def s1():
        calls.append("s1")
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        ).repartition(4)

    df1 = mgr.stage(spark, "stage1", s1, input_fingerprint=fp)

    def s2():
        calls.append("s2")
        return df1.groupBy((F.col("id") % 5).alias("k")).agg(F.sum("v").alias("s"))

    df2 = mgr.stage(spark, "stage2", s2, parents=("stage1",))
    return mgr, df2


def test_first_run_writes_manifests(spark, root):
    calls = []
    mgr, df2 = _run_pipeline(spark, root, calls)
    assert calls == ["s1", "s2"]
    m1 = mgr.manifest("stage1")
    assert m1["total_rows"] == 100
    assert len(m1["partitions"]) == 4
    assert sum(p["rows"] for p in m1["partitions"]) == 100
    assert all(p["bytes"] > 0 for p in m1["partitions"])
    assert df2.count() == 5


def test_restart_skips_completed_stages(spark, root):
    calls = []
    _, first = _run_pipeline(spark, root, calls)
    first_rows = sorted((r.k, r.s) for r in first.collect())

    calls2 = []
    mgr2, second = _run_pipeline(spark, root, calls2)
    assert calls2 == []  # both stages skipped — builders never invoked
    assert mgr2.results["stage1"].skipped and mgr2.results["stage2"].skipped
    assert sorted((r.k, r.s) for r in second.collect()) == first_rows


def test_fingerprint_change_invalidates_chain(spark, root):
    calls = []
    _run_pipeline(spark, root, calls, fp="v1")
    calls2 = []
    _run_pipeline(spark, root, calls2, fp="v2")
    # stage1 input changed -> recompute; stage2's parent digest changed too
    assert calls2 == ["s1", "s2"]


def test_downstream_only_recompute(spark, root):
    calls = []
    _run_pipeline(spark, root, calls)
    shutil.rmtree(os.path.join(root, "stage2"))
    calls2 = []
    _run_pipeline(spark, root, calls2)
    assert calls2 == ["s2"]  # stage1 untouched, stage2 rebuilt


def test_partial_write_is_discarded(spark, root):
    calls = []
    _run_pipeline(spark, root, calls)
    # simulate a crash: leftover tmp dir + a final dir without _SUCCESS
    os.makedirs(os.path.join(root, "stage1" + TMP_SUFFIX), exist_ok=True)
    os.remove(os.path.join(root, "stage1", "_SUCCESS"))
    calls2 = []
    _run_pipeline(spark, root, calls2)
    assert "s1" in calls2  # incomplete stage not trusted
    assert not os.path.exists(os.path.join(root, "stage1" + TMP_SUFFIX))


def test_corrupt_manifest_recomputes(spark, root):
    calls = []
    _run_pipeline(spark, root, calls)
    with open(os.path.join(root, "stage1", MANIFEST), "w") as f:
        f.write("{not json")
    calls2 = []
    _run_pipeline(spark, root, calls2)
    assert calls2 == ["s1", "s2"]


def test_lineage_and_metrics(spark, root):
    calls = []
    mgr, _ = _run_pipeline(spark, root, calls)
    chain = mgr.lineage("stage2")
    assert [m["stage_id"] for m in chain] == ["stage1", "stage2"]
    assert chain[1]["parents"] == ["stage1"]
    met = mgr.metrics()
    assert met["stage1"]["rows"] == 100 and met["stage1"]["n_partitions"] == 4
    assert met["stage2"]["skipped"] is False
    # manifest is valid json on disk with a digest covering partition stats
    with open(os.path.join(root, "stage2", MANIFEST)) as f:
        m = json.load(f)
    assert m["digest"] == fingerprint_of(
        m["input_fingerprint"],
        *[f"{p['file']}:{p['rows']}:{p['bytes']}" for p in m["partitions"]],
    )


def test_spine_resumable_end_to_end(spark, tmp_path):
    """Integration: the real spine resumes and matches the plain spine."""
    from imposm2_spark.plans.pipeline import spine, spine_resumable
    from imposm2_spark.sources import fixtures, testdata

    docs = testdata.synth_documents_web(
        testdata.load(spark, "/root/testdata/sf0.001", "documents")
    )
    polys = fixtures.world_octants_df(spark, cell_level=4)
    want = sorted(
        (r.z, r.x, r.y, r.n_docs, r.n_polygons, r.sum_chars)
        for r in spine(docs, polys, zooms=(2,), cell_level=4).collect()
    )
    root = str(tmp_path / "spine_ckpt")
    kw = dict(zooms=(2,), cell_level=4, input_fingerprint="sf0.001")
    got1 = sorted(
        (r.z, r.x, r.y, r.n_docs, r.n_polygons, r.sum_chars)
        for r in spine_resumable(spark, docs, polys, root, **kw).collect()
    )
    assert got1 == want
    # restart: stages skipped (manifests intact), identical output
    from imposm2_spark.plans.checkpoint import CheckpointManager

    got2 = sorted(
        (r.z, r.x, r.y, r.n_docs, r.n_polygons, r.sum_chars)
        for r in spine_resumable(spark, docs, polys, root, **kw).collect()
    )
    assert got2 == want
    mgr = CheckpointManager(root)
    assert mgr.manifest("enrich")["total_rows"] == 500
    assert mgr.manifest("pip_join")["parents"] == ["enrich"]


def test_spine_resumable_invalidates_on_polygon_change(spark, tmp_path):
    """Review r4: the pip_join checkpoint must be invalidated when the
    POLYGONS input changes, not only when docs/enrich change — pre-fix the
    second run silently returned tiles built against the old polygon set."""
    from imposm2_spark.plans.pipeline import spine, spine_resumable
    from imposm2_spark.sources import fixtures, testdata

    docs = testdata.synth_documents_web(
        testdata.load(spark, "/root/testdata/sf0.001", "documents")
    )
    polys_a = fixtures.world_octants_df(spark, cell_level=4)
    polys_b = fixtures.polygons_admin_df(spark, cell_level=4)
    root = str(tmp_path / "spine_ckpt")
    kw = dict(zooms=(2,), cell_level=4, input_fingerprint="sf0.001")

    got_a = sorted(
        tuple(r) for r in spine_resumable(spark, docs, polys_a, root, **kw).collect()
    )
    got_b = sorted(
        tuple(r) for r in spine_resumable(spark, docs, polys_b, root, **kw).collect()
    )
    want_b = sorted(
        tuple(r) for r in spine(docs, polys_b, zooms=(2,), cell_level=4).collect()
    )
    assert got_b == want_b
    assert got_a != got_b  # the two polygon sets genuinely differ


def _run_snapshot_pipeline(spark, root, calls, fp="v1"):
    mgr = CheckpointManager(root, commit="snapshot")

    def s1():
        calls.append("s1")
        return spark.range(50).select(
            F.col("id"), (F.col("id") * 7).alias("v")
        ).repartition(3)

    df1 = mgr.stage(spark, "stage1", s1, input_fingerprint=fp)

    def s2():
        calls.append("s2")
        return df1.groupBy((F.col("id") % 4).alias("k")).agg(F.sum("v").alias("s"))

    df2 = mgr.stage(spark, "stage2", s2, parents=("stage1",))
    return mgr, df2


def test_snapshot_commit_never_renames_directories(spark, root, monkeypatch):
    """r5 stretch (r4 verdict ask #9): commit="snapshot" must publish via
    immutable attempt dirs + a single pointer-object replace and NEVER call
    a directory rename at this layer — the primitive object stores lack.
    os.rename is poisoned for the whole run; os.replace (single small file,
    maps to one PUT) stays allowed."""
    from imposm2_spark.plans import checkpoint as cp

    def no_rename(*a, **k):
        raise AssertionError("snapshot commit must not rename directories")

    monkeypatch.setattr(cp.os, "rename", no_rename)
    calls = []
    mgr, df2 = _run_snapshot_pipeline(spark, root, calls)
    assert calls == ["s1", "s2"]
    assert df2.count() == 4
    # committed layout: snap dir + pointer, no bare parquet in the stage dir
    sdir = os.path.join(root, "stage1")
    assert os.path.exists(os.path.join(sdir, "_current.json"))
    snaps = [n for n in os.listdir(sdir) if n.startswith("snap-")]
    assert len(snaps) == 1
    assert os.path.exists(os.path.join(sdir, snaps[0], MANIFEST))


def test_snapshot_restart_skips_and_invalidates(spark, root):
    calls = []
    _run_snapshot_pipeline(spark, root, calls)
    calls2 = []
    mgr, df2 = _run_snapshot_pipeline(spark, root, calls2)
    assert calls2 == []  # both stages resolved through the pointer
    assert df2.count() == 4
    # input change -> full recompute into NEW snapshots; old ones remain
    calls3 = []
    mgr3, _ = _run_snapshot_pipeline(spark, root, calls3, fp="v2")
    assert calls3 == ["s1", "s2"]
    sdir = os.path.join(root, "stage1")
    assert len([n for n in os.listdir(sdir) if n.startswith("snap-")]) == 2


def test_snapshot_reader_isolation_and_vacuum(spark, root):
    """An open reader pinned to the pre-republish snapshot keeps reading it
    (immutable dirs); vacuum() removes only what the pointer doesn't
    reference."""
    calls = []
    mgr, _ = _run_snapshot_pipeline(spark, root, calls)
    reader = spark.read.parquet(mgr.data_dir("stage1"))
    assert reader.count() == 50

    calls2 = []
    mgr2, _ = _run_snapshot_pipeline(spark, root, calls2, fp="v2")
    assert reader.count() == 50  # old snapshot untouched by the re-publish

    sdir = os.path.join(root, "stage1")
    removed = mgr2.vacuum("stage1")
    assert len(removed) == 1 and removed[0].startswith("snap-")
    left = [n for n in os.listdir(sdir) if n.startswith("snap-")]
    assert len(left) == 1
    assert spark.read.parquet(mgr2.data_dir("stage1")).count() == 50


def test_snapshot_crashed_attempt_is_invisible_and_vacuumable(spark, root):
    """A fully-written but UNPOINTED snapshot (crash between data write and
    pointer flip) is invisible to resume — the next run recomputes into a
    fresh attempt dir without deleting anything first — and vacuum GCs it."""
    calls = []
    _run_snapshot_pipeline(spark, root, calls)
    sdir = os.path.join(root, "stage1")
    # simulate a crashed attempt: copy the committed snap under a new name,
    # leaving the pointer at the original
    (committed,) = [n for n in os.listdir(sdir) if n.startswith("snap-")]
    orphan = committed[:-3] + f"{int(committed[-3:]) + 1:03d}"
    shutil.copytree(os.path.join(sdir, committed), os.path.join(sdir, orphan))

    calls2 = []
    mgr2, df2 = _run_snapshot_pipeline(spark, root, calls2)
    assert calls2 == []  # pointer still resolves the committed snapshot
    assert df2.count() == 4
    removed = mgr2.vacuum("stage1")
    assert removed == [orphan]


def test_vacuum_sweeps_orphaned_pointer_temps(spark, root):
    """Review r5: a SIGKILL inside the pointer-commit window leaves a
    `.cur_*` temp in the stage dir (a FAILED commit unlinks its own; a kill
    cannot) — vacuum must GC those alongside unpointed snapshots, or a
    long-lived crashing deployment accumulates unbounded litter."""
    calls = []
    mgr, _ = _run_snapshot_pipeline(spark, root, calls)
    sdir = os.path.join(root, "stage1")
    orphan = os.path.join(sdir, ".cur_orphan123")
    with open(orphan, "w") as f:
        f.write("{}")
    removed = mgr.vacuum("stage1")
    assert ".cur_orphan123" in removed
    assert not os.path.exists(orphan)
    # the pointer and its committed snapshot are untouched
    assert os.path.exists(os.path.join(sdir, "_current.json"))
    assert [n for n in os.listdir(sdir) if n.startswith("snap-")]


def test_failed_pointer_commit_unlinks_its_temp(spark, root, monkeypatch):
    """Review r5: when the pointer PUT itself fails (object-store error),
    the commit raises AND removes its `.cur_*` staging temp — the stage dir
    must not accumulate one temp per failed commit attempt."""
    import pytest

    mgr = CheckpointManager(root, commit="snapshot")
    real_replace = os.replace

    def poisoned(src, dst):
        if os.path.basename(dst) == "_current.json":
            raise OSError("simulated pointer PUT failure")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", poisoned)
    with pytest.raises(OSError, match="simulated pointer PUT failure"):
        mgr.stage(
            spark,
            "stage1",
            lambda: spark.range(5).select(F.col("id")),
            input_fingerprint="v1",
        )
    sdir = os.path.join(root, "stage1")
    assert not [n for n in os.listdir(sdir) if n.startswith(".cur_")]


def test_failed_rebuild_keeps_previous_committed_output(spark, root):
    """Review r5: a stage whose input fingerprint changed must keep its LAST
    COMMITTED parquet readable until the replacement is fully written — the
    old delete-up-front left a no-data window the length of the rebuild, so
    a failing build() destroyed the only good checkpoint."""
    mgr = CheckpointManager(root)
    mgr.stage(
        spark, "stage1",
        lambda: spark.range(10).select(F.col("id")), input_fingerprint="v1",
    )
    final_dir = mgr.data_dir("stage1")
    assert spark.read.parquet(final_dir).count() == 10

    def exploding():
        raise RuntimeError("rebuild blew up")

    with pytest.raises(RuntimeError, match="rebuild blew up"):
        mgr.stage(spark, "stage1", exploding, input_fingerprint="v2")
    # the committed v1 output is still there and still readable
    assert spark.read.parquet(final_dir).count() == 10
    m = mgr.manifest("stage1")
    assert m is not None and m["input_fingerprint"] == fingerprint_of(
        "v1", fingerprint_of()
    )
    # and a successful retry still replaces it
    df = mgr.stage(
        spark, "stage1",
        lambda: spark.range(7).select(F.col("id")), input_fingerprint="v2",
    )
    assert df.count() == 7


def test_vacuum_refuses_on_corrupt_pointer(spark, root):
    """Review r5: a pointer file that EXISTS but cannot be parsed (truncated
    by power loss) must stop vacuum — treating it as 'no pointer' would
    rmtree the committed current snapshot it referenced."""
    calls = []
    mgr, _ = _run_snapshot_pipeline(spark, root, calls)
    sdir = os.path.join(root, "stage1")
    snaps_before = sorted(n for n in os.listdir(sdir) if n.startswith("snap-"))
    with open(os.path.join(sdir, "_current.json"), "w") as f:
        f.write('{"snapsh')  # truncated mid-write
    with pytest.raises(RuntimeError, match="refusing to GC"):
        mgr.vacuum("stage1")
    assert sorted(n for n in os.listdir(sdir) if n.startswith("snap-")) == snaps_before
    # a parseable pointer that names no snapshot is equally refused
    with open(os.path.join(sdir, "_current.json"), "w") as f:
        f.write("{}")
    with pytest.raises(RuntimeError, match="names no snapshot"):
        mgr.vacuum("stage1")
    assert sorted(n for n in os.listdir(sdir) if n.startswith("snap-")) == snaps_before


def test_parent_digest_cross_process_and_missing(spark, root):
    """Review r5: a parent absent from the in-process results dict must fall
    back to its ON-DISK manifest digest (cross-process resume computes the
    same child fingerprint and skips), and a parent with neither must raise —
    silently folding an empty digest would freeze the child's fingerprint and
    later serve a STALE child checkpoint after the parent changed."""
    calls = []
    _run_pipeline(spark, root, calls)
    assert calls == ["s1", "s2"]

    # fresh manager, child called WITHOUT staging the parent in-process:
    # on-disk fallback must yield the same fingerprint -> skip, not rebuild
    mgr2 = CheckpointManager(root)
    ran = []

    def s2():
        ran.append("s2")
        return spark.range(1).select(F.col("id"))

    mgr2.stage(spark, "stage2", s2, parents=("stage1",))
    assert ran == []
    assert mgr2.results["stage2"].skipped

    # a parent that never ran anywhere: loud, not silent
    mgr3 = CheckpointManager(str(root) + "_empty")
    with pytest.raises(KeyError, match="run the parent first"):
        mgr3.stage(spark, "child", s2, parents=("ghost",))
