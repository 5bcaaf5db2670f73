#!/usr/bin/env python3
"""Round-close artifact self-check — run BEFORE the round's final commit.

Round 14 closed with the driver's correctness artifact empty and nobody
noticing (the file landed after the last commit, and nothing gated on
the driver-visible artifacts being parsable). This script is that gate
for everything the BUILDER controls:

  1. BENCH_FULL.json parses, its run reached "complete", n_failed == 0,
     and the per-query map covers the full gate set;
  2. a sampled cross-family Verify at sf0.01 + tools/check.py is green
     (the driver-gate mirror, bounded to < ~10 min);
  3. the sampled run's oracle_sql.json and _errors.json are non-empty /
     parsable — the exact files whose absence zeroed round 14.

Usage: python3 tools/round_close_check.py [round]
With a round number, tees its own output to tools/round_close_r{N}.log
so the check's evidence is committable alongside the artifacts.
Exit 0 = safe to close the round; anything else fails LOUDLY.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = "/tmp/round_close_verify"
# one-or-more gates per family: relational scans/joins/aggs, windows,
# set ops, SQL faces, RecDB models + scoring + SQL path, dedup (exact /
# LSH / substr), ANN, BPE/packing, curation (batch + streaming + drift),
# BM25/hybrid, shards/retention/maintenance, deferred actions
SAMPLE_PREFIXES = ",".join([
    "q1_agg", "q3_join", "q_topk", "q_window", "q_except_all",
    "q_sql_vacuum", "q_sql_sweep", "q_sql_asof",
    "r_itemcf_scores", "r_svd_topk", "r_recommend_sql",
    "p_minhash_lsh", "p_substr_dedup", "p_semdedup", "p_bm25_search",
    "p_pack_tokens", "p_epoch_order", "p_curate_pipeline",
    "s_dedup_exact", "s_curate", "s_maint_vacuum", "s_shard_asof",
])
MIN_GATES = 270  # full registry is 279; fail if the map shrank past this


def fail(msg: str) -> None:
    print(f"ROUND-CLOSE CHECK FAILED: {msg}", flush=True)
    sys.exit(1)


def check_bench() -> None:
    path = os.path.join(REPO, "BENCH_FULL.json")
    if not os.path.exists(path):
        fail(f"{path} missing — run graft.Bench before closing the round")
    if os.path.getsize(path) < 100:
        fail(f"{path} is {os.path.getsize(path)} bytes — empty/truncated")
    try:
        art = json.load(open(path))
    except Exception as e:
        fail(f"{path} does not parse: {e}")
    stage = art.get("stage")
    if stage != "complete":
        fail(f"BENCH_FULL.json stage is '{stage}' — the bench run did "
             "not finish (timeout/kill mid-run?)")
    nq = art.get("n_queries", len(art.get("queries", {})))
    if nq < MIN_GATES:
        fail(f"BENCH_FULL.json covers {nq} gates (< {MIN_GATES}) — "
             "gate registry shrank or the run was partial")
    n_failed = art.get("n_failed")
    if n_failed is None:
        print("WARN: BENCH_FULL.json has no n_failed field (pre-r15 "
              "artifact) — re-run graft.Bench for the asserted form",
              flush=True)
    elif n_failed != 0:
        fail(f"BENCH_FULL.json records n_failed={n_failed}")
    for k in ("workload_qps", "workload_topk_qps", "workload_view_qps",
              "workload_sweep_users_per_sec", "workload_hybrid_qps"):
        if art.get(k, -1.0) <= 0:
            fail(f"BENCH_FULL.json workload metric {k} missing/negative "
                 f"({art.get(k)})")
    print(f"OK BENCH_FULL.json: complete, {nq} gates, n_failed="
          f"{n_failed}, total {art.get('value', 0):.1f}s", flush=True)


def check_verify_mirror() -> None:
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {SF_DIR} {OUT_DIR} {SAMPLE_PREFIXES}"],
        cwd=REPO, capture_output=True, text=True)
    progress = [ln for ln in r.stderr.splitlines()
                if ln.startswith("[verify]")]
    for ln in progress[-5:]:
        print(ln, flush=True)
    if r.returncode != 0:
        fail(f"sampled Verify exited {r.returncode}; stderr tail:\n"
             + r.stderr[-1500:])
    # the two files whose absence/emptiness zeroed round 14
    oracle = os.path.join(OUT_DIR, "oracle_sql.json")
    try:
        oracles = json.load(open(oracle))
    except Exception as e:
        fail(f"{oracle} missing/unparsable: {e}")
    if not oracles:
        fail(f"{oracle} is empty — no gates matched the sample prefixes")
    try:
        errs = json.load(open(os.path.join(OUT_DIR, "_errors.json")))
    except Exception as e:
        fail(f"_errors.json missing/unparsable: {e}")
    if errs:
        fail(f"sampled Verify recorded query errors: {sorted(errs)}")
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"),
         SF_DIR, OUT_DIR], capture_output=True, text=True)
    tail = chk.stdout.strip().splitlines()
    for ln in tail[-3:]:
        print(ln, flush=True)
    if chk.returncode != 0:
        fails = [ln for ln in tail if ln.startswith("FAIL")]
        fail("gate mirror red:\n" + "\n".join(fails[:10]))
    print(f"OK gate mirror: {len(oracles)} sampled gates green", flush=True)


def main() -> None:
    check_bench()
    check_verify_mirror()
    print("ROUND-CLOSE CHECK PASSED — artifacts are parsable, complete, "
          "and the sampled gate mirror is green", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        log = os.path.join(REPO, "tools", f"round_close_r{sys.argv[1]}.log")

        class Tee:
            def __init__(self, *streams):
                self.streams = streams

            def write(self, s):
                for st in self.streams:
                    st.write(s)

            def flush(self):
                for st in self.streams:
                    st.flush()

        f = open(log, "w")
        sys.stdout = Tee(sys.stdout, f)
    main()
