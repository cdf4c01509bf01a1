"""Round-5 TPU job queue: chain every device job so the chip never idles.

ONE TPU client at a time (CLAUDE.md) — this queue serialises the round's
device work and is the only process that attaches to the chip:

  1. sparse-kernel parity decomposition probe (VERDICT r4 weak #6)
  2. 192-atom structural-lever sweep arms (VERDICT r4 missing #1):
     kNN-48 / L=7 / t_loss_weight=2 on the winning h_residual+virtual_node
     recipe, protocol-identical to docs/quality/size192net_lever_sweep.json
  3. flagship predefined retrain (live checkpoint for bench/CLIs — the
     sandbox recycle deleted runs/ again)
  4. 512-atom curriculum run from the best arm (VERDICT #1c), with the
     epoch budget auto-sized to the remaining wall clock
  5. real-data full-budget run (VERDICT #2)
  6. learned-schedule seed runs (VERDICT #3)

Every long job runs under benchmarks/tpu_watchdog.py (stall kill +
--resume relaunch; kill-by-PID only). A global DEADLINE skips jobs that
no longer fit and force-frees the chip before the driver's round-end
bench. Estimates are deliberately pessimistic (degraded-tunnel rates).

Usage:  python benchmarks/r5_queue.py --hours 9.5 [--skip probe,k48,...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
DEADLINE = None  # epoch seconds, set in main


def log(msg):
    print(f"[r5_queue {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def run_watchdog(name, cmd, metrics, est_s, stall=2400, hard_extra=1.35):
    """Run one job under the watchdog; skip if it doesn't fit the deadline.

    ``hard_extra``: the watchdog subprocess itself is bounded at
    est * hard_extra + 1200 s so a pathological job cannot eat the queue
    (the watchdog's own stall logic handles wedges; this is the backstop).
    Returns True if the job ran to rc=0.
    """
    budget = est_s * hard_extra + 1200
    if remaining() < budget:
        log(f"SKIP {name}: needs ~{budget/60:.0f} min, "
            f"{remaining()/60:.0f} min left")
        return False
    logf = f"/tmp/r5_{name}.log"
    full = [PY, os.path.join(REPO, "benchmarks", "tpu_watchdog.py"),
            "--log", logf, "--metrics", metrics, "--stall", str(stall),
            "--"] + cmd
    log(f"START {name} (est {est_s/60:.0f} min, budget {budget/60:.0f} "
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
        f"(log tail: {logf})")
    return rc == 0


def size_gen_cmd(out_dir, *, epochs, k, L=5, h_init, extra=()):
    return [PY, os.path.join(REPO, "examples", "size_generalization.py"),
            "--out_dir", out_dir, "--epochs", str(epochs),
            "--train_cells", "96", "--train_min", "160",
            "--train_max", "192", "--batch_size", "32",
            "--neighbor_k", str(k), "--L", str(L),
            "--generator", "network", "--h_residual", "--virtual_node",
            "--h_init_scale", str(h_init), "--sample_steps", "250",
            "--sizes", "192", "--gen_cells", "16",
            "--checkpoint_every", "150", "--resume", *extra]


def arm_excess(out_dir):
    p = os.path.join(REPO, out_dir, "size_gen_summary.json")
    try:
        with open(p) as f:
            d = json.load(f)
        return d["sizes"]["n192"]["panel"]["excess_rdf_cos"]
    except Exception as e:
        log(f"no summary for {out_dir}: {e}")
        return None


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hours", type=float, default=9.3,
                    help="wall-clock budget; the queue exits and frees "
                         "the chip at start + hours")
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated job names to skip")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    # ---- 1. parity probe (short; plain timeout, no metrics file) -------
    if "probe" not in skip and remaining() > 3000:
        log("START probe_sparse_parity")
        try:
            subprocess.run([PY, "benchmarks/probe_sparse_parity.py"],
                           timeout=2700, cwd=REPO)
        except subprocess.TimeoutExpired:
            log("probe: timeout — continuing")

    # ---- 2. 192-atom lever sweep arms ----------------------------------
    arms = {
        # name: (out_dir, cmd, est_s)
        "k48": ("runs/s192r5_k48",
                size_gen_cmd("runs/s192r5_k48", epochs=2000, k=48,
                             h_init=4e-4, extra=("--remat",)), 4800),
        "L7": ("runs/s192r5_L7",
               size_gen_cmd("runs/s192r5_L7", epochs=2000, k=32, L=7,
                            h_init=1e-3, extra=("--remat",)), 4800),
        "tw2": ("runs/s192r5_tw2",
                size_gen_cmd("runs/s192r5_tw2", epochs=2000, k=32,
                             h_init=1e-3,
                             extra=("--t_loss_weight", "2.0")), 3600),
    }
    for name, (out_dir, cmd, est) in arms.items():
        if name in skip:
            continue
        run_watchdog(name, cmd, os.path.join(out_dir, "metrics.jsonl"),
                     est_s=est)

    # ---- 3. flagship predefined retrain (live checkpoint for bench) ----
    if "flagship" not in skip:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400)

    # ---- 4. 512-atom curriculum run from the best arm ------------------
    if "s512" not in skip:
        scores = {}
        for name, (out_dir, _, _) in arms.items():
            v = arm_excess(out_dir)
            if v is not None:
                scores[name] = v
        log(f"arm excess_rdf_cos: {scores} "
            "(r3 baseline hres+vn@K32: 0.5696)")
        winner = max(scores, key=scores.get) if scores else None
        if winner is not None:
            # architecture must match the curriculum source
            arch = {
                "k48": dict(k=48, L=5, h_init=4e-4, batch=16, sec_ep=8.0),
                "L7": dict(k=32, L=7, h_init=1e-3, batch=32, sec_ep=6.0),
                "tw2": dict(k=32, L=5, h_init=1e-3, batch=32, sec_ep=4.5),
            }[winner]
            eval_budget = 3000  # 512-atom sampling + panel + ceilings
            train_s = remaining() - eval_budget - 1800
            epochs = int(max(600, min(2600, train_s / arch["sec_ep"])))
            extra = ["--init_from", arms[winner][0]]
            if winner == "tw2":
                extra += ["--t_loss_weight", "2.0"]
            cmd = [PY, "examples/size_generalization.py",
                   "--out_dir", "runs/s512r5",
                   "--epochs", str(epochs), "--train_cells", "96",
                   "--train_min", "448", "--train_max", "512",
                   "--batch_size", str(arch["batch"]),
                   "--neighbor_k", str(arch["k"]), "--L", str(arch["L"]),
                   "--generator", "network", "--h_residual",
                   "--virtual_node", "--h_init_scale",
                   str(arch["h_init"]), "--remat",
                   "--sample_steps", "250", "--sizes", "512",
                   "--gen_cells", "16", "--chunk", "2",
                   "--checkpoint_every", "100", "--resume"] + extra
            log(f"512 curriculum from {winner}: {epochs} epochs")
            run_watchdog("s512", cmd, "runs/s512r5/metrics.jsonl",
                         est_s=epochs * arch["sec_ep"] + eval_budget,
                         hard_extra=1.25)
        else:
            log("SKIP s512: no arm produced a summary")

    # ---- 5. real-data full budget (VERDICT #2) --------------------------
    if "realdata" not in skip:
        run_watchdog(
            "realdata",
            [PY, "examples/real_data_e2e.py", "--work_dir",
             "runs/real_data_r5", "--epochs", "3000"],
            "runs/real_data_r5/run_2NN/metrics.jsonl", est_s=4200,
            stall=5400)  # the driver chains 2NN -> 1NN -> eval phases
        # that never touch the watched file again; only a hard hang
        # should kill it

    # ---- 6. learned-schedule seeds (VERDICT #3) -------------------------
    for seed in (2025, 2026):
        name = f"learned{seed}"
        if name in skip:
            continue
        run_watchdog(
            name,
            [PY, "examples/quality_demo.py", "--out_dir",
             f"runs/q_learned_r5_s{seed}", "--epochs", "3000",
             "--shells", "2", "--n_max", "16", "--noise_schedule",
             "learned", "--gamma_init", "polynomial", "--seed", str(seed),
             "--tag", f"learned_poly_3000ep_2shell_n16_seed{seed}",
             "--resume"],
            f"runs/q_learned_r5_s{seed}/metrics.jsonl", est_s=2700)

    log(f"queue done, {remaining()/60:.0f} min to deadline — chip freed")


if __name__ == "__main__":
    main()
