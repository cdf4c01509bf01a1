"""Round-5 TPU job queue, take 9 (re-run the arms the recycle killed).

queue8's recovery tail restored the flagship durable artifact; the chip
is free again and the round clock is still ticking, so re-launch the
queue7 arms that died unmeasured, smallest first so each lands a
complete artifact before the next starts:

  1. v192 — v-parameterization arm at the standard 192 protocol
     (2000 ep; completes the eps/x0/v parameterization story)
  2. s512_x0 — the x0 promotion to 512 at the r3b protocol budget
     (epochs auto-sized to remaining clock, cap 4000, checkpointed
     every 100 so a recycle mid-run can resume)

Usage: python benchmarks/r5_queue9.py --hours 8
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
    print(f"[r5_queue9 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def run_watchdog(name, cmd, metrics, alloc_s, stall=2400):
    if alloc_s < 600:
        log(f"SKIP {name}: only {alloc_s/60:.0f} min left")
        return False
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
    ap.add_argument("--hours", type=float, default=8.0)
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    if "v192" not in skip:
        run_watchdog(
            "v192",
            [PY, os.path.join(REPO, "examples", "size_generalization.py"),
             "--out_dir", "runs/s192r5_v",
             "--epochs", "2000", "--train_cells", "96",
             "--train_min", "160", "--train_max", "192",
             "--batch_size", "32", "--neighbor_k", "32", "--L", "5",
             "--generator", "network", "--h_residual",
             "--virtual_node", "--h_init_scale", "0.001", "--remat",
             "--x_parameterization", "v",
             "--sample_steps", "250", "--sizes", "192",
             "--gen_cells", "16", "--checkpoint_every", "150",
             "--resume"],
            "runs/s192r5_v/metrics.jsonl",
            alloc_s=min(7200, remaining() - 300))

    if "s512x0" not in skip:
        eval_budget = 3300
        sec_ep = 2.6  # measured 512-b32 bound (queue7 docstring)
        alloc = remaining() - 600
        epochs = int(max(800, min(4000, (alloc - eval_budget - 900)
                                  / sec_ep)))
        cmd = [PY, os.path.join(REPO, "examples",
                                "size_generalization.py"),
               "--out_dir", "runs/s512r5_x0",
               "--epochs", str(epochs), "--train_cells", "96",
               "--train_min", "448", "--train_max", "512",
               "--batch_size", "32", "--neighbor_k", "32", "--L", "5",
               "--generator", "network", "--h_residual",
               "--virtual_node", "--h_init_scale", "0.001", "--remat",
               "--x_parameterization", "x0",
               "--sample_steps", "250", "--sizes", "512",
               "--gen_cells", "16", "--chunk", "2",
               "--checkpoint_every", "100", "--resume"]
        log(f"s512x0: {epochs} epochs, alloc {alloc/60:.0f} min")
        run_watchdog("s512x0", cmd, "runs/s512r5_x0/metrics.jsonl",
                     alloc_s=alloc)

    log(f"queue9 done, {remaining()/60:.0f} min to deadline - chip freed")


if __name__ == "__main__":
    main()
