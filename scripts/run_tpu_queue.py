"""Run the TPU measurement queue (TPU_QUEUE.md) end-to-end, with logging.

Probes tunnel health first, then runs each pending measurement script
SEQUENTIALLY (never two TPU programs at once on this 1-core host), probing
again between items — the axon tunnel has mid-session outages. Each item's
stdout/stderr goes to ``tpu_runs/<name>.log`` plus a summary line to
``tpu_runs/queue_summary.json``. Resume-safe: items with an existing OK log
are skipped unless --force.

Usage:  python scripts/run_tpu_queue.py [--only exp_scatter4,bench]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(REPO, "tpu_runs")

# (name, command, timeout_s) in TPU_QUEUE.md priority order (round 4)
QUEUE = [
    ("bench_r4", [sys.executable, "bench.py"], 1800),
    ("exp_gate_samples",
     [sys.executable, "scripts/exp_gate_samples.py"], 5400),
    ("bench_pipeline", [sys.executable, "bench_pipeline.py"], 3600),
    ("bench_tracking_r4", [sys.executable, "bench_tracking.py"], 1800),
    ("bench_droid_r4", [sys.executable, "bench_droid.py"], 2400),
    ("exp_vo_cut_r4", [sys.executable, "scripts/exp_vo_cut.py"], 2400),
    ("exp_floor_r4", [sys.executable, "scripts/exp_floor.py"], 2400),
    ("exp_floor_r5", [sys.executable, "scripts/exp_floor.py"], 2400),
    ("exp_gather_pallas",
     [sys.executable, "scripts/exp_gather_pallas.py"], 2400),
    # v2: decomposition arms (full spf=4/1, no-dpt) + the device-resident
    # enhancement packet path landed after the first bench_pipeline run
    ("bench_pipeline_v2", [sys.executable, "bench_pipeline.py"], 3600),
    ("exp_raybatch2", [sys.executable, "scripts/exp_raybatch2.py"], 1800),
    # in-step gate for the isolated 25% split win (exp_gather_pallas):
    # adjacent-window baseline first, then same bench with
    # NERF_VO_GATHER_SPLITS=16
    ("bench_base_r5", [sys.executable, "bench.py"], 1800),
    ("bench_splits16",
     [sys.executable, "-c",
      "import os; os.environ['NERF_VO_GATHER_SPLITS']='16'; "
      "import runpy; runpy.run_path('bench.py', run_name='__main__')"],
     1800),
    # v3: packet path fully device-resident (no per-keyframe D2H stall)
    ("bench_pipeline_v3", [sys.executable, "bench_pipeline.py"], 3600),
    # round 5: DPVO FPS with the member-table (gather-route) SoftAgg —
    # exp_vo_cut_r4 attributed +4.2 ms to the scatter route
    ("bench_tracking_r5", [sys.executable, "bench_tracking.py"], 1800),
    # ---- round 5 (priority order; bench_pixslice DROPPED: exp_raybatch2
    # d10 lost 2.2x isolated, adjudication rule unmet) ----
    # in-step A/B for the double-buffered pixel-batch prefetch (VERDICT r4
    # item 3 — the biggest untried single-chip lever, ~6 ms/step at stake)
    ("exp_prefetch", [sys.executable, "scripts/exp_prefetch.py"], 4200),
    # quality half of the bf16-pixel flip (speed half: exp_raybatch2 d8
    # measured 1.65x on 2026-08-21)
    ("exp_gate_bf16",
     [sys.executable, "scripts/exp_gate_samples.py", "--bf16-only"], 3600),
    # same-session A-B-A adjudication of the SoftAgg route (VERDICT r4
    # weak #2; default reverted to scatter pending this)
    ("exp_softagg_ab", [sys.executable, "scripts/exp_softagg_ab.py"], 5400),
    # DROID update-step bisect (VERDICT r4 weak #5)
    ("exp_droid_cut", [sys.executable, "scripts/exp_droid_cut.py"], 3600),
    # v4 adds the realistic-keyframe-rate arm (kf/5) + this round's
    # tracker/sampler changes
    ("bench_pipeline_v4", [sys.executable, "bench_pipeline.py"], 3600),
    # reshape-free fused gather+interp (one-hot MXU contraction) — the
    # bounded VERDICT r4 weak-#6 follow-up; same script, new arm 5b
    ("exp_gather_mm", [sys.executable, "scripts/exp_gather_pallas.py"], 2400),
    ("exp_vo_cut_r5", [sys.executable, "scripts/exp_vo_cut.py"], 2400),
    # honest DROID frontend rate: motion_threshold=0 (the old bench timed
    # encode+filter only — random weights admit nothing at threshold 2.4)
    ("bench_droid_r5", [sys.executable, "bench_droid.py"], 2400),
    # final headline AFTER any default flips (re-run with --force)
    ("bench_r5", [sys.executable, "bench.py"], 1800),
    # clean pacing-curve re-run: v4's spf<=1 kf/5 arms inverted with a
    # monotonic tunnel slowdown; one more session adjudicates the curve
    ("bench_pipeline_v5", [sys.executable, "bench_pipeline.py"], 3600),
    # corr-lookup decomposition (row-take floor / bf16 volumes / einsum)
    ("exp_droid_corr", [sys.executable, "scripts/exp_droid_corr.py"], 1800),
    ("bench_r5b", [sys.executable, "bench.py"], 1800),
    # re-adjudicate the phased-table-grads rejection (old single-seed
    # -1.36 dB) under the paired-seed IQM gate; +16% headline at stake
    ("exp_gate_phase",
     [sys.executable, "scripts/exp_gate_samples.py", "--phase-only"], 3600),
    # ---- round-5 continuation (post dense-BA block assembly, 6adebfc) --
    # in-step speed half of the larger-ray-batch decision (A-B-A sweep
    # 4096/8192/16384/32768/4096; 16K-only was never isolated — the
    # 203.6K reading had failed phasing mixed in)
    ("exp_batch16", [sys.executable, "scripts/exp_batch16.py"], 3600),
    # post-block-assembly DROID re-attribution (BA solve 34.9 -> 9.66 ms
    # isolated; expect update ~57.4 -> ~32 ms) + honest full-admission FPS
    ("exp_droid_cut_r5b", [sys.executable, "scripts/exp_droid_cut.py"],
     3600),
    ("bench_droid_r5c", [sys.executable, "bench_droid.py"], 2400),
    # fresh driver-citable headline (confirmation; no flip landed —
    # exp_batch16 adjudicated negative, STATUS 16a)
    ("bench_r5c", [sys.executable, "bench.py"], 1800),
    # quality half of the (speed-rejected) 16K flip — RECORD-ONLY, last
    ("exp_gate_16k",
     [sys.executable, "scripts/exp_gate_samples.py", "--rays16k-only"],
     5400),
]


def probe(timeout=240) -> bool:
    # cold tunnel starts have been observed at ~75 s for the first tiny
    # matmul; 90 s false-negatives on them
    try:
        r = subprocess.run(
            [sys.executable, "scripts/probe_tpu.py"], cwd=REPO,
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of queue item names")
    ap.add_argument("--force", action="store_true",
                    help="re-run items that already have an OK log")
    args = ap.parse_args()
    os.makedirs(LOGDIR, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    summary_path = os.path.join(LOGDIR, "queue_summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)

    for name, cmd, timeout in QUEUE:
        if only is not None and name not in only:
            continue
        if not args.force and summary.get(name, {}).get("rc") == 0:
            print(f"[queue] {name}: already OK, skipping (--force to rerun)")
            continue
        if not probe():
            print(f"[queue] tunnel unhealthy before {name}; stopping")
            return 2
        log = os.path.join(LOGDIR, f"{name}.log")
        print(f"[queue] running {name} (timeout {timeout}s) -> {log}")
        t0 = time.time()
        # the queue's own probe loop spaces retries — don't let bench.py
        # additionally sit in its 45-min outage-retry window (it would hit
        # the item timeout instead of returning a retryable rc=3)
        child_env = dict(os.environ, NERF_VO_BENCH_RETRY_S="0")
        try:
            with open(log, "w") as f:
                r = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                                   stdout=f, stderr=subprocess.STDOUT,
                                   env=child_env)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -9
        dt = time.time() - t0
        summary[name] = {"rc": rc, "seconds": round(dt, 1),
                         "log": os.path.relpath(log, REPO),
                         "when": time.strftime("%Y-%m-%d %H:%M:%S")}
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"[queue] {name}: rc={rc} in {dt:.0f}s")
        if rc == 3 and name.startswith("bench"):
            # bench exits 3 on its own outage probe (mid-queue tunnel
            # flap): that is retryable, not a broken bench
            return 2
    print(f"[queue] done; summary in {summary_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
