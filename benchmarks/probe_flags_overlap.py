"""VERDICT r3 #5 probe: close the 2.95 -> 2.83 ms measured-floor gap.

The remaining 0.93 ms/step of the flagship denoiser is VPU elementwise
work (silu/sigmoid on the [N,N,1024] pre-activations) that XLA's default
schedule does not hide behind the MXU matmuls (benchmarks/
probe_step_variants.py, docs/ROADMAP.md). Two budget-boxed attacks, both
exact-parity (no approximations, no dtype changes):

  1. XLA flag sweep — each flag set runs the REAL headline program
     (bench.py in a subprocess: XLA_FLAGS bind at backend init).
  2. In-program scheduling variants of the same step math inside one
     lax.scan: operand-order/fusion-barrier variants that give the
     scheduler more freedom (or force it) to overlap the x-branch MXU
     matmul with the m-branch VPU chain.

Writes docs/perf/flags_overlap_probe.json; if nothing moves >=2%, the
ROADMAP records the number as final (the probe IS the deliverable either
way).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "more_vmem": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "aggressive_fusion": (
        "--xla_tpu_enable_latency_hiding_scheduler=true "
        "--xla_tpu_scoped_vmem_limit_kib=65536"
    ),
}


def run_bench(extra_flags: str):
    env = dict(os.environ)
    if extra_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " "
                            + extra_flags).strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=3000,
    )
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")]
    if proc.returncode != 0 or not line:
        return {"error": proc.returncode,
                "tail": proc.stdout[-400:] + proc.stderr[-400:]}
    out = json.loads(line[-1])
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    results = {"flag_sets": {}}
    for name, flags in FLAG_SETS.items():
        r = run_bench(flags)
        if r.get("error") is not None:
            # the chip can refuse attach for a short window after the
            # previous client exits — settle and retry once
            time.sleep(90)
            r = run_bench(flags)
        results["flag_sets"][name] = {
            "flags": flags,
            "seconds_per_structure": r.get("seconds_per_structure"),
            "value": r.get("value"),
            "error": r.get("error"),
            "tail": r.get("tail"),
        }
        print(name, {k: v for k, v in results["flag_sets"][name].items()
                     if k != "tail"}, flush=True)
        if r.get("error") is not None:
            print("  tail:", (r.get("tail") or "")[-300:], flush=True)

    out = os.path.join(REPO, "docs", "perf", "flags_overlap_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
