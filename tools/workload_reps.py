#!/usr/bin/env python3
"""Fresh-JVM workload repetitions -> BENCH_WORKLOADS_r{N}.json.

Runs `sbt runMain graft.Bench workloads` REPS times (each a fresh JVM),
parses the compact JSON line each run prints, and writes an artifact
carrying every rep plus min/median/max per metric — the variance bars
the single-sample r11/r12 artifacts lacked, so serving-qps movement can
be attributed to noise vs code.

Usage: python3 tools/workload_reps.py <round> [reps] [sfDir]
"""
import json
import re
import subprocess
import sys

WORKLOAD_KEYS = [
    "workload_qps", "workload_topk_qps", "workload_view_qps",
    "workload_sweep_users_per_sec", "workload_hybrid_qps",
]


def one_rep(sf_dir: str) -> dict:
    env = dict(__import__("os").environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench workloads"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    line = None
    for ln in out.stdout.splitlines():
        if ln.startswith('{"metric"'):
            line = ln
    if line is None:
        raise RuntimeError(
            "no bench line in output; tail:\n" + out.stdout[-2000:])
    d = json.loads(re.sub(r"\[info\] ", "", line))
    r = {k: d[k] for k in WORKLOAD_KEYS}
    # per-loop rep arrays (loop 1 = cold C2, loop 3 = steady) ride the
    # workloads-only compact line — keep them for cold/steady reporting
    r["_loops"] = d.get("workloads_reps", {})
    return r


def main() -> None:
    rnd = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    rows = []
    for i in range(reps):
        r = one_rep(sf_dir)
        print(f"rep {i + 1}/{reps}: {r}", flush=True)
        rows.append(r)
    LOOP_KEY = {"workload_qps": "qps", "workload_topk_qps": "topk",
                "workload_view_qps": "view",
                "workload_sweep_users_per_sec": "sweep",
                "workload_hybrid_qps": "hybrid"}
    stats = {}
    for k in WORKLOAD_KEYS:
        vs = sorted(r[k] for r in rows)
        # cold-start vs steady-state (VERDICT r14 #7): loop 1 of a fresh
        # JVM is the cold-C2 number a deployment pays on its first
        # queries; the final loop is steady-state. Averaged across the
        # fresh-JVM reps.
        loops = [r["_loops"].get(LOOP_KEY[k], []) for r in rows]
        firsts = [l[0] for l in loops if l]
        lasts = [l[-1] for l in loops if l]
        stats[k] = {
            "reps": [r[k] for r in rows],
            "min": vs[0],
            "median": vs[len(vs) // 2],
            "max": vs[-1],
            "spread_pct": (vs[-1] - vs[0]) / vs[-1] * 100 if vs[-1] else 0,
            "cold_start": sum(firsts) / len(firsts) if firsts else None,
            "steady_state": sum(lasts) / len(lasts) if lasts else None,
        }
    art = {
        "protocol": f"{reps}x fresh-JVM `runMain graft.Bench workloads` "
                    "reps; per-metric min/median/max across JVMs (each "
                    "metric is the median of 3 loops within its JVM); "
                    "cold_start = mean of each JVM's loop 1 (cold C2), "
                    "steady_state = mean of each JVM's final loop",
        "sf": sf_dir,
        "metrics": stats,
    }
    path = f"/root/repo/BENCH_WORKLOADS_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
