"""Round-5 TPU job queue, take 7 (adds the v-parameterization 192 arm).

The x0 lever returned a SPLIT verdict at 192
(docs/quality/size192_r5_lever_sweep.json x0_split_verdict): it loses
the straight excess-RDF promotion gate (0.3531 vs 0.5696) but is the
first lever ever to move the first-shell deficits toward ground truth —
bond peak width 0.195 vs 0.279 (GT 0.169), CN(Si) 3.16 vs 2.79 (GT
3.31), Si-O-Si W1 16.2° vs 23.3°. The 512-atom wall's measured
signature IS that first-shell set (size512_r4_summary.json: bond peak
~2x broad, angle W1 25.6°, excess ~0), so the mechanism gets its 512
test at the full r3b protocol budget. queue5's fallback would have
spent the slack on the flagship retrain instead; s1024 runs ~4 s/epoch
(1024-cell cache hit), freeing ~5 h.

Sequence:
  1. wait for the orphaned s1024 watchdog; hard-stop it at --s1024_cutoff
     hours from launch if still running (kill watchdog by PID, then the
     child's process group read from /proc before the kill)
  2. s512_x0 — 512-atom CRN run with x_parameterization=x0, epochs
     auto-sized (cap 4000 = the r3b 512 protocol budget)
  3. flagship predefined retrain if >= 55 min remain

Usage: python benchmarks/r5_queue7.py --hours 8.2 --wait_pid 12276
"""

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
DEADLINE = None


def log(msg):
    print(f"[r5_queue7 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def children_of(pid):
    out = []
    task_dir = f"/proc/{pid}/task"
    try:
        for t in os.listdir(task_dir):
            with open(f"{task_dir}/{t}/children") as f:
                out += [int(c) for c in f.read().split()]
    except OSError:
        pass
    return out


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
        log(f"{name}: HARD TIMEOUT after {budget/60:.0f} min")
        rc = -1
    log(f"END {name}: rc={rc} after {(time.time()-t0)/60:.1f} min "
        f"(log: {logf})")
    return rc == 0


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hours", type=float, default=8.2)
    ap.add_argument("--wait_pid", type=int, required=True)
    ap.add_argument("--s1024_cutoff", type=float, default=5.0,
                    help="hours from queue launch after which a still-"
                         "running s1024 is hard-stopped (checkpoints + "
                         "--resume make the kill cheap)")
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    cutoff = time.time() + args.s1024_cutoff * 3600
    log(f"deadline in {args.hours:.1f} h, s1024 cutoff in "
        f"{args.s1024_cutoff:.1f} h")

    wd = args.wait_pid
    while os.path.exists(f"/proc/{wd}"):
        if time.time() > cutoff:
            kids = children_of(wd)
            log(f"s1024 cutoff reached — killing watchdog {wd} and "
                f"child groups {kids}")
            try:
                os.kill(wd, signal.SIGKILL)
            except OSError:
                pass
            for k in kids:
                try:
                    os.killpg(k, signal.SIGKILL)
                except OSError:
                    try:
                        os.kill(k, signal.SIGKILL)
                    except OSError:
                        pass
            time.sleep(10)
            break
        time.sleep(30)
    log("chip free")
    time.sleep(15)

    # ---- s512 x0 promotion ----------------------------------------------
    if "s512x0" not in skip:
        V192_RESERVE = 5400
        alloc = remaining() - V192_RESERVE - 600
        eval_budget = 3300
        sec_ep = 2.6   # measured: 4 s/ep at 1024-b16 (16384 atoms/step,
        #                6 steps); 512-b32 is the same atoms/step at 3
        #                steps, plus margin
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
                     est_s=epochs * sec_ep + eval_budget, alloc_s=alloc)

    # ---- v-parameterization 192 arm -------------------------------------
    # v = alpha eps - sigma x0 interpolates the x0 split verdict's two
    # poles (first-shell sharpness at high noise, eps conditioning at low
    # noise) - measured at the same 192 protocol as every other arm.
    if "v192" not in skip:
        cmd = [PY, os.path.join(REPO, "examples",
                                "size_generalization.py"),
               "--out_dir", "runs/s192r5_v",
               "--epochs", "2000", "--train_cells", "96",
               "--train_min", "160", "--train_max", "192",
               "--batch_size", "32", "--neighbor_k", "32", "--L", "5",
               "--generator", "network", "--h_residual",
               "--virtual_node", "--h_init_scale", "0.001", "--remat",
               "--x_parameterization", "v",
               "--sample_steps", "250", "--sizes", "192",
               "--gen_cells", "16", "--checkpoint_every", "150",
               "--resume"]
        run_watchdog("v192", cmd, "runs/s192r5_v/metrics.jsonl",
                     est_s=4200, alloc_s=min(6000, remaining() - 300))

    # ---- flagship retrain (only if the v arm left room) -----------------
    if "flagship" not in skip and remaining() > 3300:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400,
            alloc_s=remaining() - 300)

    log(f"queue7 done, {remaining()/60:.0f} min to deadline - chip freed")


if __name__ == "__main__":
    main()
