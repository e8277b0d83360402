"""XL rehearsal of the byte-level PBF scan (S1 literal form): encode a
synthetic extract (~2M elements) once, then measure the block-parallel
read_pbf decode through Spark — counts + a tag aggregation so the whole
columnar path materializes. ONE short JSON line (bench.py protocol).

Usage:
    SPARK_GRAFT_PBF_NODES=2000000 python scripts/bench_pbf_xl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from imposm2_spark.kernels import pbf as k
    from imposm2_spark.session import get_spark
    from imposm2_spark.sources.pbf import read_pbf

    n_nodes = int(os.environ.get("SPARK_GRAFT_PBF_NODES", "2000000"))
    n_ways = n_nodes // 10
    n_rels = n_nodes // 200
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    path = os.environ.get("SPARK_GRAFT_PBF_PATH", "/tmp/xl.osm.pbf")

    t0 = time.time()
    nodes = [
        k.PbfNode(
            i,
            (-180.0 + (i * 9973 % 3_600_000) / 10_000.0),
            (-85.0 + (i * 7919 % 1_700_000) / 10_000.0),
            {"highway": "primary", "name": f"n{i}"} if i % 7 == 0 else {},
        )
        for i in range(1, n_nodes + 1)
    ]
    ways = [
        k.PbfWay(
            10_000_000 + i,
            list(range(1 + i % 1000, 1 + i % 1000 + 8)),
            {"highway": "residential"} if i % 3 == 0 else {"landuse": "park"},
        )
        for i in range(n_ways)
    ]
    rels = [
        k.PbfRelation(
            50_000_000 + i,
            [("way", 10_000_000 + i, "outer"), ("way", 10_000_001 + i, "inner")],
            {"type": "multipolygon"},
        )
        for i in range(n_rels)
    ]
    n_blobs = k.encode_file(path, nodes, ways, rels)
    enc_sec = round(time.time() - t0, 3)
    size_mb = round(os.path.getsize(path) / 1e6, 1)
    del nodes, ways, rels

    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run():
        dfs = read_pbf(spark, path)
        nn = dfs["nodes"].where("tags['highway'] = 'primary'").count()
        nw = dfs["ways"].count()
        nr = dfs["relations"].count()
        return nn, nw, nr

    run()  # warm
    t0 = time.time()
    nn, nw, nr = run()
    wall = round(time.time() - t0, 3)
    total = n_nodes + n_ways + n_rels
    print(
        json.dumps(
            {
                "pbf_xl": {
                    "metric": "pbf_scan_xl",
                    "value": wall,
                    "unit": "sec",
                    "cpus": cpus,
                    "n_elements": total,
                    "n_blobs": n_blobs,
                    "file_mb": size_mb,
                    "encode_sec": enc_sec,
                    "elements_per_sec": round(total / wall, 1),
                    "tagged_primary_nodes": nn,
                    "note": "S1 literal byte scan: driver header-range scan + "
                    "mapInPandas blob decode (3 passes: filtered node agg + "
                    "way/relation counts)",
                }
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
