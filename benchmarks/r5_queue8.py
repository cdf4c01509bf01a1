"""Round-5 TPU job queue, take 8 (post-recycle recovery tail).

The 2026-08-20 sandbox recycle wiped runs/ mid-queue7: the s512 x0
promotion, the v192 arm and the flagship retrain all died, and the
flagship predefined checkpoint (runs/q_predef_r5, the third retrain of
the record recipe) was lost AGAIN — the only durable checkpoint left is
artifacts/q_learned_r5_s2025.npz. With ~80 min of round clock left the
one job that fits and matters is the flagship predefined retrain, this
time snapshotted straight to a committed npz so no future recycle can
take it:

  1. flagship predefined 3000-ep retrain (the recipe that reproduced
     0.896/0.932 rdf_cos, angle R2 0.977 three times) with periodic
     checkpoints so watchdog kill+resume is cheap
  2. snapshot runs/q_predef_r5 -> artifacts/q_predef_r5.npz (CPU)

Usage: python benchmarks/r5_queue8.py --minutes 80
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
DEADLINE = None


def log(msg):
    print(f"[r5_queue8 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def run_watchdog(name, cmd, metrics, alloc_s, stall=2400):
    logf = f"/tmp/r5_{name}.log"
    full = [PY, os.path.join(REPO, "benchmarks", "tpu_watchdog.py"),
            "--log", logf, "--metrics", metrics, "--stall", str(stall),
            "--"] + cmd
    log(f"START {name} (alloc {alloc_s/60:.0f} min): {' '.join(cmd)}")
    t0 = time.time()
    try:
        proc = subprocess.run(full, timeout=alloc_s, cwd=REPO)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        log(f"{name}: HARD TIMEOUT after {alloc_s/60:.0f} min")
        rc = -1
    log(f"END {name}: rc={rc} after {(time.time()-t0)/60:.1f} min "
        f"(log: {logf})")
    return rc == 0


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=80.0)
    args = ap.parse_args()
    DEADLINE = time.time() + args.minutes * 60
    log(f"deadline in {args.minutes:.0f} min")

    ok = run_watchdog(
        "flagship",
        [PY, "examples/quality_demo.py", "--out_dir", "runs/q_predef_r5",
         "--epochs", "3000", "--shells", "2", "--n_max", "16",
         "--checkpoint_every", "300",
         "--tag", "predef_3000ep_2shell_n16_r5b", "--resume"],
        "runs/q_predef_r5/metrics.jsonl",
        alloc_s=max(600, remaining() - 240))

    # Snapshot whatever checkpoint exists (final on success, periodic on
    # timeout) on CPU so the chip is already free for the driver bench.
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    snap = subprocess.run(
        [PY, os.path.join(REPO, "benchmarks", "snapshot_run.py"),
         "runs/q_predef_r5", "artifacts/q_predef_r5.npz"],
        cwd=REPO, env=env, timeout=900)
    log(f"snapshot rc={snap.returncode} (train ok={ok})")
    log(f"queue8 done, {remaining()/60:.0f} min to deadline - chip freed")


if __name__ == "__main__":
    main()
