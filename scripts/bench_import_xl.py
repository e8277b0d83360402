"""XL-scale rehearsal of the import path (r4 verdict item: only spine/curate
had XL numbers; the import pipeline's scale shape was argued, not measured).

Builds a replicated OSM element fixture IN SPARK (never a driver list):
the MP-01..09 + street-grid fixture cross-joined with `spark.range(K)`
replicas, every id/ref offset into a disjoint id space per replica, PLUS one
10^4-member mega-relation (a giant ring of 2-point way segments + segmented
hole — the O10b chunked-assembly shape). Defaults give ~1.6M ways / ~10^5
relations / ~6M nodes at K=12000.

Runs plans.import_pipeline.import_tables with the full 16-table default
mapping, reports elements/sec plus total/peak stage shuffle bytes pulled from
the AppStatusStore (stage deltas across the run), and prints ONE short JSON
line — same parse-safe protocol as bench.py.

Usage:
    SPARK_GRAFT_XL_REPLICAS=12000 python scripts/bench_import_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_SPACE = 10_000_000  # per-replica id offset: disjoint node/way/rel id spaces


def replicated_fixture(spark, replicas: int):
    """(nodes, ways, relations) DataFrames: base fixture x `replicas`."""
    from pyspark.sql import functions as F

    from imposm2_spark.sources import fixtures

    nodes0, ways0, rels0 = fixtures.osm_dfs(spark)
    reps = spark.range(replicas).withColumnRenamed("id", "_rep")
    off = F.col("_rep") * F.lit(ID_SPACE)

    nodes = reps.join(F.broadcast(nodes0)).select(
        (F.col("id") + off).alias("id"), "lon", "lat", "tags"
    )
    ways = reps.join(F.broadcast(ways0)).select(
        (F.col("id") + off).alias("id"),
        F.transform("refs", lambda r: r + off).alias("refs"),
        "tags",
    )
    rels = reps.join(F.broadcast(rels0)).select(
        (F.col("id") + off).alias("id"),
        F.transform(
            "members",
            lambda m: F.struct(
                (m["ref"] + off).alias("ref"),
                m["type"].alias("type"),
                m["role"].alias("role"),
            ),
        ).alias("members"),
        "tags",
    )
    return nodes, ways, rels


def mega_relation(spark, n_members: int = 10_000):
    """One relation with `n_members` 2-point way segments forming a giant
    ring + a 4-segment hole (tests/test_assemble.py O10b shape at 2.5x)."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from imposm2_spark.sources.fixtures import (
        OSM_NODES_SCHEMA,
        OSM_RELATIONS_SCHEMA,
        OSM_WAYS_SCHEMA,
    )

    base = 900_000_000_000
    n = n_members - 5  # ring segments; 4 hole segments + headroom
    theta = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.c_[100.0 * np.cos(theta), 100.0 * np.sin(theta)]
    nodes, ways = [], []
    for i in range(n):
        nodes.append((base + i, float(ring[i, 0]), float(ring[i, 1]), {}))
    for i in range(n):
        a, b = base + i, base + (i + 1) % n
        refs = [a, b] if i % 3 else [b, a]  # direction-invariance stress
        ways.append((base + 10_000_000 + i, refs, {}))
    sq = [(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0), (-2.0, 2.0)]
    for j, (x, y) in enumerate(sq):
        nodes.append((base + n + j, x, y, {}))
    for j in range(4):
        ways.append(
            (base + 20_000_000 + j, [base + n + j, base + n + (j + 1) % 4], {})
        )
    members = [
        {"ref": w[0], "type": "way", "role": ""} for w in ways
    ]
    rels = [(base, members, {"type": "multipolygon", "landuse": "meadow"})]
    return (
        spark.createDataFrame(nodes, OSM_NODES_SCHEMA),
        spark.createDataFrame(ways, OSM_WAYS_SCHEMA),
        spark.createDataFrame(rels, OSM_RELATIONS_SCHEMA),
    )


def shuffle_totals(spark) -> tuple[int, int, int]:
    """(total_write, total_read, peak_stage_write) bytes from AppStatusStore."""
    jvm = spark._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    arr = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False, arr, jvm.java.util.ArrayList()
    )
    tw = tr = pk = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        w = s.shuffleWriteBytes()
        tw += w
        tr += s.shuffleReadBytes()
        pk = max(pk, w)
    return tw, tr, pk


def main() -> None:
    replicas = int(os.environ.get("SPARK_GRAFT_XL_REPLICAS", "12000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mega_members = int(os.environ.get("SPARK_GRAFT_XL_MEGA_MEMBERS", "10000"))

    from imposm2_spark.operators import defaultmapping as dm
    from imposm2_spark.plans.import_pipeline import import_tables
    from imposm2_spark.session import get_spark

    spark = get_spark(
        app_name="imposm2_spark_import_xl",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            # shuffle_totals diffs AppStatusStore snapshots: the default
            # 1000-stage retention would evict warm-run stages between the
            # two snapshots, undercounting (or negating) the deltas exactly
            # at the scale this script targets
            "spark.ui.retainedStages": "100000",
        },
    )

    nodes, ways, rels = replicated_fixture(spark, replicas)
    mn, mw, mr = mega_relation(spark, mega_members)
    nodes, ways, rels = (
        nodes.unionByName(mn),
        ways.unionByName(mw),
        rels.unionByName(mr),
    )
    n_nodes, n_ways, n_rels = nodes.count(), ways.count(), rels.count()
    n_elements = n_nodes + n_ways + n_rels

    def run_once():
        out = import_tables(spark, nodes, ways, rels, dm.ALL_SPECS)
        rows = {}
        for name, df in sorted(out.items()):
            rows[name] = df.count()
        return rows

    run_once()  # C2 JIT warm at size (BASELINE.md: several runs to steady)
    w0, r0, _ = shuffle_totals(spark)
    t0 = time.perf_counter()
    rows = run_once()
    wall = time.perf_counter() - t0
    w1, r1, pk = shuffle_totals(spark)

    print(
        json.dumps(
            {
                "metric": "import_xl_elements_per_sec",
                "value": round(n_elements / wall, 1),
                "unit": "elements/sec",
                "wall_sec": round(wall, 3),
                "replicas": replicas,
                "n_nodes": n_nodes,
                "n_ways": n_ways,
                "n_relations": n_rels,
                "mega_members": mega_members,
                "cpus": cpus,
                "out_rows": {k: v for k, v in rows.items() if v},
                "shuffle_write_bytes": w1 - w0,
                "shuffle_read_bytes": r1 - r0,
                "peak_stage_shuffle_write_bytes": pk,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
