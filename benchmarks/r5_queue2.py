"""Round-5 TPU job queue, take 2 (replaces r5_queue.py mid-round).

Why a v2: r5_queue.py's s512 sizing was self-defeating — it sized the
curriculum run's epochs to fill the remaining wall clock, then its own
skip guard (`est*1.25+1200 > remaining`) rejected any job sized that way
whenever more than ~70 min remained, so the round's TOP verdict item
would always be skipped. v2 allocates s512 an explicit budget =
remaining MINUS reservations for the jobs queued after it.

Sequence (chip-serial, ONE TPU client at a time):
  0. wait for the orphaned L7 watchdog (PID file /tmp/r5_l7_watchdog.pid)
  1. re-run the sparse-parity probe — the precision=HIGHEST fix to
     ops/egcl_pallas_sparse.py landed AFTER the first probe; the pre-fix
     artifact is preserved as docs/perf/sparse_parity_default_precision
     .json and this run writes the post-fix sparse_parity_f32.json
  2. tw2 lever arm (t_loss_weight=2.0, the last of the 3-arm sweep)
  3. s512 curriculum from the best arm (VERDICT r4 #1) — explicit alloc
  4. flagship predefined retrain (live checkpoint for bench/CLIs)
  5. real-data full budget (VERDICT r4 #2)
  6. learned-schedule seed (VERDICT r4 #3) if time remains

Usage: python benchmarks/r5_queue2.py --hours 7.6
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

L7_WATCHDOG_PID = 10889  # orphaned when r5_queue.py was killed


def log(msg):
    print(f"[r5_queue2 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def remaining():
    return DEADLINE - time.time()


def pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def run_watchdog(name, cmd, metrics, est_s, stall=2400, alloc_s=None):
    """Run one job under the watchdog inside an explicit time allocation.

    ``alloc_s``: hard wall-clock budget for this job (defaults to
    est*1.35+1200). The job is skipped only if its allocation exceeds the
    time left — the caller sizes alloc_s so that never happens for jobs
    it has reserved time for.
    """
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


ARMS = {
    # name: (out_dir, arch for a 512 curriculum run from this arm)
    "k48": ("runs/s192r5_k48",
            dict(k=48, L=5, h_init=4e-4, batch=16, sec_ep=8.0)),
    "L7": ("runs/s192r5_L7",
           dict(k=32, L=7, h_init=1e-3, batch=32, sec_ep=7.0)),
    "tw2": ("runs/s192r5_tw2",
            dict(k=32, L=5, h_init=1e-3, batch=32, sec_ep=5.5)),
}


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hours", type=float, default=7.6)
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    # ---- 0. wait for the orphaned L7 watchdog --------------------------
    while pid_alive(L7_WATCHDOG_PID):
        log(f"waiting for L7 watchdog (pid {L7_WATCHDOG_PID})...")
        time.sleep(60)
    log("L7 done — chip free")

    # ---- 1. post-precision-fix parity probe ----------------------------
    if "probe" not in skip and remaining() > 3600:
        log("START probe_sparse_parity (post precision=HIGHEST fix)")
        try:
            subprocess.run([PY, "benchmarks/probe_sparse_parity.py"],
                           timeout=2700, cwd=REPO)
        except subprocess.TimeoutExpired:
            log("probe: timeout — continuing")

    # ---- 2. tw2 arm -----------------------------------------------------
    if "tw2" not in skip:
        run_watchdog(
            "tw2",
            size_gen_cmd("runs/s192r5_tw2", epochs=2000, k=32,
                         h_init=1e-3, extra=("--t_loss_weight", "2.0")),
            "runs/s192r5_tw2/metrics.jsonl", est_s=3600)

    # ---- 3. s512 curriculum from the best arm ---------------------------
    # reservations for everything queued after s512
    RESERVE_FLAGSHIP = 3900   # est 2400 * 1.35 + 700
    RESERVE_REALDATA = 5800
    RESERVE_MARGIN = 600
    if "s512" not in skip:
        scores = {n: arm_excess(d) for n, (d, _) in ARMS.items()}
        scores = {n: v for n, v in scores.items() if v is not None}
        log(f"arm excess_rdf_cos: {scores} "
            "(r3 baseline hres+vn@K32: 0.5696)")
        good = {n: v for n, v in scores.items() if v >= 0.25}
        pool = good or scores
        winner = max(pool, key=pool.get) if pool else None
        if not good and winner:
            log(f"WARNING: no arm beat excess 0.25 — curriculum from the "
                f"least-bad arm {winner} ({scores[winner]:.3f}); a trained"
                " init still beats random for the 512 budget")
        if winner is not None:
            arch = ARMS[winner][1]
            alloc = (remaining() - RESERVE_FLAGSHIP - RESERVE_REALDATA
                     - RESERVE_MARGIN)
            eval_budget = 3300  # 512-atom chunked sampling + ceilings
            train_s = alloc - eval_budget - 900  # 900: compile + resume
            epochs = int(max(400, min(2600, train_s / arch["sec_ep"])))
            extra = ["--init_from", ARMS[winner][0]]
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
            log(f"512 curriculum from {winner}: {epochs} epochs, alloc "
                f"{alloc/60:.0f} min")
            run_watchdog("s512", cmd, "runs/s512r5/metrics.jsonl",
                         est_s=epochs * arch["sec_ep"] + eval_budget,
                         alloc_s=alloc)
        else:
            log("SKIP s512: no arm produced a summary")

    # ---- 4. flagship predefined retrain ---------------------------------
    if "flagship" not in skip:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400,
            alloc_s=RESERVE_FLAGSHIP)

    # ---- 5. real-data full budget (VERDICT #2) ---------------------------
    if "realdata" not in skip:
        run_watchdog(
            "realdata",
            [PY, "examples/real_data_e2e.py", "--work_dir",
             "runs/real_data_r5", "--epochs", "3000"],
            "runs/real_data_r5/run_2NN/metrics.jsonl", est_s=4200,
            stall=5400, alloc_s=min(RESERVE_REALDATA, remaining() - 300))

    # ---- 6. learned-schedule seed (VERDICT #3) ---------------------------
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

    log(f"queue2 done, {remaining()/60:.0f} min to deadline — chip freed")


if __name__ == "__main__":
    main()
