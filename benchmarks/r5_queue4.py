"""Round-5 TPU job queue, take 4 (the post-restart session's device work).

Where take 3 ended: all eight VERDICT-r4 items landed except the 1024
bracket (#6, deferred for chip-hours) and the real-data angle gap, which
is now DIAGNOSED (docs/quality/real_data_angle_diagnosis.json): the
corpus's discrete angle values cap within-cluster extraction at R2 0.19.
The measured lever is thermal-rattle corpus widening
(data/polymorphs.write_corpus n_rattles) — each rattled snapshot's
spectrum is recomputed from the perturbed cell's true geometry, so the
corpus gains a continuous angle spread without label noise.

Sequence (chip-serial, ONE TPU client at a time — CLAUDE.md):
  1. realdata_rattled — full-budget polymorph run on the 4x rattled
     corpus (VERDICT r4 missing #2 closure attempt)
  2. s1024 — first 1024-atom CRN training + bracketed panel (VERDICT #6),
     epochs auto-sized to the remaining wall clock; direct training at
     the target size (512->1024 extrapolation is refuted, and the 512
     curriculum checkpoint was lost to the run-dir recycle)
  3. x0_192 — the x0 coordinate-parameterization lever at the 192-atom
     protocol (the remaining untested 512-wall candidate; code lands on
     CPU while jobs 1-2 hold the chip)
  4. flagship restore if time remains (live checkpoint for the CLIs)

Usage: python benchmarks/r5_queue4.py --hours 9.8 [--skip a,b]
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
    print(f"[r5_queue4 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
    ap.add_argument("--hours", type=float, default=9.8)
    ap.add_argument("--skip", type=str, default="")
    args = ap.parse_args()
    DEADLINE = time.time() + args.hours * 3600
    skip = set(filter(None, args.skip.split(",")))
    log(f"deadline in {args.hours:.1f} h")

    RESERVE_X0 = 4500      # 192-protocol lever run (~61 min measured)
    RESERVE_MARGIN = 600

    # ---- 1. real-data full budget on the rattled corpus -----------------
    # 3 rattles -> 184 samples; batch 32 keeps ~6 steps/epoch; 1500 ep
    # x 2 ranges ~= 2x the step count of the (converged-in-epochs) r5
    # run, with 4x conditioning diversity — the diagnosed lever.
    if "realdata" not in skip:
        run_watchdog(
            "realdata_rattled",
            [PY, "examples/real_data_e2e.py", "--work_dir",
             "runs/real_data_r5b", "--epochs", "1500", "--rattles", "3",
             "--batch_size", "32",
             "--out_json", "docs/quality/real_data_e2e_rattled.json"],
            "runs/real_data_r5b/run_2NN/metrics.jsonl", est_s=9000,
            stall=5400, alloc_s=11700)

    # ---- 2. 1024-atom CRN bracket (VERDICT #6) --------------------------
    if "s1024" not in skip:
        alloc = remaining() - RESERVE_X0 - RESERVE_MARGIN
        eval_budget = 3600   # chunked 1024 generation + panel + ceilings
        train_s = alloc - eval_budget - 900   # compile + resume slack
        sec_ep = 14.0        # b16 x 1024 = same atoms/step as the 512
        #                      b32 run (7 s/ep) at 2x the steps/epoch
        epochs = int(max(400, min(2600, train_s / sec_ep)))
        cmd = [PY, "examples/size_generalization.py",
               "--out_dir", "runs/s1024r5",
               "--epochs", str(epochs), "--train_cells", "96",
               "--train_min", "960", "--train_max", "1024",
               "--batch_size", "16", "--neighbor_k", "32", "--L", "5",
               "--generator", "network", "--h_residual",
               "--virtual_node", "--h_init_scale", "0.001", "--remat",
               "--sample_steps", "250", "--sizes", "1024",
               "--gen_cells", "8", "--chunk", "2",
               "--checkpoint_every", "100", "--resume"]
        log(f"s1024: {epochs} epochs, alloc {alloc/60:.0f} min")
        run_watchdog("s1024", cmd, "runs/s1024r5/metrics.jsonl",
                     est_s=epochs * sec_ep + eval_budget, alloc_s=alloc)

    # ---- 3. x0-parameterization lever at the 192 protocol ---------------
    if "x0" not in skip:
        cmd = [PY, "examples/size_generalization.py",
               "--out_dir", "runs/s192r5_x0",
               "--epochs", "2000", "--train_cells", "96",
               "--train_min", "160", "--train_max", "192",
               "--batch_size", "32", "--neighbor_k", "32", "--L", "5",
               "--generator", "network", "--h_residual",
               "--virtual_node", "--h_init_scale", "0.001", "--remat",
               "--x_parameterization", "x0",
               "--sample_steps", "250", "--sizes", "192",
               "--gen_cells", "16", "--checkpoint_every", "150",
               "--resume"]
        run_watchdog("x0_192", cmd, "runs/s192r5_x0/metrics.jsonl",
                     est_s=4200, alloc_s=min(RESERVE_X0 + 1200,
                                             remaining() - 300))

    # ---- 4. flagship predefined retrain (live checkpoint) ---------------
    if "flagship" not in skip and remaining() > 3600:
        run_watchdog(
            "flagship",
            [PY, "examples/quality_demo.py", "--out_dir",
             "runs/q_predef_r5", "--epochs", "3000", "--shells", "2",
             "--n_max", "16", "--tag", "predef_3000ep_2shell_n16_r5",
             "--resume"],
            "runs/q_predef_r5/metrics.jsonl", est_s=2400,
            alloc_s=remaining() - 300)

    log(f"queue4 done, {remaining()/60:.0f} min to deadline — chip freed")


if __name__ == "__main__":
    main()
