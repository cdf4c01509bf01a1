"""Round-5 TPU job queue, take 5 (reorder after realdata finished early).

queue4's realdata_rattled leg completed in ~30 min instead of the
195-min allocation (tiny polymorph cells train fast with on-device epoch
accumulation), which frees enough chip time to move the x0-lever 192 run
AHEAD of the 1024 bracket: its verdict then lands early enough to
promote a win to a 512-atom run — the round's top item (VERDICT r4
missing #1) — instead of arriving in the session's final hour.

Sequence (chip-serial; waits for queue4's orphaned realdata watchdog to
exit before attaching):
  1. x0_192 — x_parameterization="x0" at the 192 lever protocol
  2. IF the x0 panel's excess_rdf_cos >= 0.50 (at/above the hres+vn
     baseline 0.5696): s512_x0 — promote the mechanism to 512 atoms
  3. s1024 — first 1024-atom CRN bracket (VERDICT #6), epochs auto-sized
     to the remaining clock
  4. flagship predefined retrain if >= 55 min remain

Usage: python benchmarks/r5_queue5.py --hours 9.0 --wait_pid 6101
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
    print(f"[r5_queue5 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


def size_gen(out_dir, *, epochs, sizes, train_min, train_max, batch,
             extra=()):
    return [PY, os.path.join(REPO, "examples", "size_generalization.py"),
            "--out_dir", out_dir, "--epochs", str(epochs),
            "--train_cells", "96", "--train_min", str(train_min),
            "--train_max", str(train_max), "--batch_size", str(batch),
            "--neighbor_k", "32", "--L", "5", "--generator", "network",
            "--h_residual", "--virtual_node", "--h_init_scale", "0.001",
            "--remat", "--sample_steps", "250", "--sizes", str(sizes),
            "--checkpoint_every", "100", "--resume"] + list(extra)


def main():
    global DEADLINE
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hours", type=float, default=9.0)
    ap.add_argument("--wait_pid", type=int, default=0,
                    help="poll until this (orphaned realdata watchdog) "
                         "PID exits before attaching to the chip")
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    # ---- 0. wait for queue4's realdata leg to free the chip -------------
    if args.wait_pid:
        log(f"waiting for PID {args.wait_pid} (realdata watchdog) …")
        while os.path.exists(f"/proc/{args.wait_pid}"):
            if remaining() < 3600:
                log("realdata never freed the chip — aborting queue")
                return
            time.sleep(30)
        log("chip free")
        time.sleep(15)  # let the tunnel worker settle

    # ---- 1. x0 lever at the 192 protocol --------------------------------
    if "x0" not in skip:
        run_watchdog(
            "x0_192",
            size_gen("runs/s192r5_x0", epochs=2000, sizes=192,
                     train_min=160, train_max=192, batch=32,
                     extra=("--gen_cells", "16",
                            "--x_parameterization", "x0")),
            "runs/s192r5_x0/metrics.jsonl", est_s=4200, alloc_s=6000)

    # ---- 2. promotion decision ------------------------------------------
    promote = False
    summary = os.path.join(REPO, "runs/s192r5_x0/size_gen_summary.json")
    try:
        with open(summary) as f:
            panel = json.load(f)["sizes"]["n192"]["panel"]
        excess = panel.get("excess_rdf_cos", 0.0)
        log(f"x0 192 excess_rdf_cos = {excess:.4f} "
            f"(baseline hres+vn 0.5696, promote at >= 0.50)")
        promote = excess >= 0.50
    except Exception as e:  # noqa: BLE001 — any missing artifact = no
        log(f"no x0 panel ({e}) — skipping promotion")

    if promote and "s512x0" not in skip:
        # auto-size: leave the 1024 bracket at least 3.2 h + flagship slop
        alloc = min(11000, remaining() - 3.2 * 3600 - 600)
        epochs = int(max(600, min(2600, (alloc - 3300 - 900) / 7.0)))
        run_watchdog(
            "s512x0",
            size_gen("runs/s512r5_x0", epochs=epochs, sizes=512,
                     train_min=448, train_max=512, batch=32,
                     extra=("--gen_cells", "16", "--chunk", "2",
                            "--x_parameterization", "x0")),
            "runs/s512r5_x0/metrics.jsonl",
            est_s=epochs * 7.0 + 3300, alloc_s=alloc)

    # ---- 3. 1024-atom bracket (VERDICT #6) ------------------------------
    if "s1024" not in skip:
        alloc = remaining() - 600
        eval_budget = 3600
        epochs = int(max(400, min(2600, (alloc - eval_budget - 900)
                                  / 14.0)))
        run_watchdog(
            "s1024",
            size_gen("runs/s1024r5", epochs=epochs, sizes=1024,
                     train_min=960, train_max=1024, batch=16,
                     extra=("--gen_cells", "8", "--chunk", "2")),
            "runs/s1024r5/metrics.jsonl",
            est_s=epochs * 14.0 + eval_budget, alloc_s=alloc)

    # ---- 4. flagship retrain if the clock allows ------------------------
    if "flagship" not in skip and remaining() > 3300:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400,
            alloc_s=remaining() - 300)

    log(f"queue5 done, {remaining()/60:.0f} min to deadline — chip freed")


if __name__ == "__main__":
    main()
