"""Round-5 TPU job queue, take 3 (replaces r5_queue2.py mid-round).

Why a v3: the 192-atom lever sweep came back with ALL THREE round-4
candidate mechanisms measured as losers at the protocol budget (k48
excess 0.0025 — overlapping atoms; L7 0.0779; tw2 0.1497 vs the r3
hres+vn baseline 0.5696), and queue2's "least-bad arm" rule then carried
the measured-harmful ``--t_loss_weight 2.0`` INTO the round's top-item
512 curriculum run. v3 relaunches the 512 leg with the curriculum
mechanism isolated: init from the tw2 arm's params (the best trained 192
init available after the run-dir recycle) but train with the r3-winning
recipe (no t-band weighting), so a failure indicts curriculum, not a
lever already shown to hurt.

Sequence (chip-serial, ONE TPU client at a time):
  1. probe_vn_kernel — the fused-kNN-kernel timing re-measure for the
     h_residual+virtual_node recipe the fast path now accepts (~20 min)
  2. s512 curriculum (VERDICT r4 #1c) — explicit allocation
  3. flagship predefined retrain (live checkpoint; runs/ was recycled)
  4. real-data full budget (VERDICT r4 #2, upgraded v2 readouts)
  5. learned-schedule seed 2025 (VERDICT r4 #3) if time remains

Usage: python benchmarks/r5_queue3.py --hours 6.0
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
DEADLINE = None


def log(msg):
    print(f"[r5_queue3 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def run_watchdog(name, cmd, metrics, est_s, stall=2400, alloc_s=None):
    budget = alloc_s if alloc_s is not None else est_s * 1.35 + 1200
    if remaining() < budget:
        log(f"SKIP {name}: needs ~{budget/60:.0f} min, "
            f"{remaining()/60:.0f} min left")
        return False
    logf = f"/tmp/r5_{name}.log"
    full = [PY, os.path.join(REPO, "benchmarks", "tpu_watchdog.py"),
            "--log", logf, "--metrics", metrics, "--stall", str(stall),
            "--"] + cmd
    log(f"START {name} (est {est_s/60:.0f} min, alloc {budget/60:.0f} "
        f"min): {' '.join(cmd)}")
    t0 = time.time()
    try:
        proc = subprocess.run(full, timeout=budget, cwd=REPO)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        log(f"{name}: HARD TIMEOUT after {budget/60:.0f} min — watchdog "
            "group killed")
        rc = -1
    log(f"END {name}: rc={rc} after {(time.time()-t0)/60:.1f} min "
        f"(log: {logf})")
    return rc == 0


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hours", type=float, default=6.0)
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    # ---- 1. vn-kernel timing probe (VERDICT r4 #4 re-measure) ----------
    if "probe" not in skip and remaining() > 3000:
        log("START probe_vn_kernel")
        try:
            subprocess.run([PY, "benchmarks/probe_vn_kernel.py"],
                           timeout=2400, cwd=REPO)
        except subprocess.TimeoutExpired:
            log("probe_vn_kernel: timeout — continuing")

    # ---- 2. s512 curriculum, lever-free recipe --------------------------
    RESERVE_FLAGSHIP = 3900
    RESERVE_REALDATA = 5800
    RESERVE_MARGIN = 600
    if "s512" not in skip:
        alloc = (remaining() - RESERVE_FLAGSHIP - RESERVE_REALDATA
                 - RESERVE_MARGIN)
        eval_budget = 3300  # 512-atom chunked sampling + ceilings
        train_s = alloc - eval_budget - 900  # compile + resume slack
        sec_ep = 7.0
        epochs = int(max(400, min(2600, train_s / sec_ep)))
        cmd = [PY, "examples/size_generalization.py",
               "--out_dir", "runs/s512r5",
               "--epochs", str(epochs), "--train_cells", "96",
               "--train_min", "448", "--train_max", "512",
               "--batch_size", "32", "--neighbor_k", "32", "--L", "5",
               "--generator", "network", "--h_residual",
               "--virtual_node", "--h_init_scale", "0.001", "--remat",
               "--sample_steps", "250", "--sizes", "512",
               "--gen_cells", "16", "--chunk", "2",
               "--checkpoint_every", "100", "--resume",
               "--init_from", "runs/s192r5_tw2"]
        log(f"512 curriculum (lever-free) from tw2: {epochs} epochs, "
            f"alloc {alloc/60:.0f} min")
        run_watchdog("s512", cmd, "runs/s512r5/metrics.jsonl",
                     est_s=epochs * sec_ep + eval_budget, alloc_s=alloc)

    # ---- 3. flagship predefined retrain ---------------------------------
    if "flagship" not in skip:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400,
            alloc_s=RESERVE_FLAGSHIP)

    # ---- 4. real-data full budget (VERDICT #2, v2 readouts) -------------
    if "realdata" not in skip:
        run_watchdog(
            "realdata",
            [PY, "examples/real_data_e2e.py", "--work_dir",
             "runs/real_data_r5", "--epochs", "3000"],
            "runs/real_data_r5/run_2NN/metrics.jsonl", est_s=4200,
            stall=5400, alloc_s=min(RESERVE_REALDATA, remaining() - 300))

    # ---- 5. learned-schedule seed (VERDICT #3) ---------------------------
    if "learned" not in skip and remaining() > 3600:
        run_watchdog(
            "learned2025",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_learned_r5_s2025", "--epochs", "3000",
             "--shells", "2", "--n_max", "16", "--noise_schedule",
             "learned", "--gamma_init", "polynomial", "--seed", "2025",
             "--tag", "learned_poly_3000ep_2shell_n16_seed2025",
             "--resume"],
            "runs/q_learned_r5_s2025/metrics.jsonl", est_s=2700,
            alloc_s=remaining() - 300)

    log(f"queue3 done, {remaining()/60:.0f} min to deadline — chip freed")


if __name__ == "__main__":
    main()
