"""Supervise a long TPU training run against tunnel wedges.

The remote-TPU tunnel occasionally wedges the client silently (low CPU,
no error, no progress — the 2026-08-18/19 incidents in docs/ROADMAP.md):
the worker stays healthy but the client never returns from an RPC. The
cure is kill-by-PID + relaunch with ``--resume`` (checkpoints every 500
epochs make this cheap). This supervisor automates that loop:

  python benchmarks/tpu_watchdog.py --log /tmp/run.log \
      --metrics runs/X/metrics.jsonl --stall 900 -- \
      python examples/size_generalization.py ... --resume

It launches the command, watches the metrics file's mtime (falling back
to the log file while the run is still compiling), and on a stall kills
the process group and relaunches. Never kills by pattern — only the PID
it spawned. Exits with the child's rc when the child finishes normally.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log", required=True, help="child stdout/stderr file")
    p.add_argument("--metrics", required=True,
                   help="progress file to watch (metrics.jsonl)")
    p.add_argument("--stall", type=int, default=900,
                   help="seconds without metrics-file progress before the "
                        "child is declared wedged")
    p.add_argument("--compile_grace", type=int, default=2400,
                   help="stall budget while the metrics file has not "
                        "moved yet at all (first compile can take long)")
    p.add_argument("--max_restarts", type=int, default=10)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- then the training command")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given after --")

    restarts = 0
    while True:
        start = time.time()
        started_metrics = mtime(args.metrics)
        with open(args.log, "ab") as logf:
            logf.write(f"\n[watchdog] launch: {' '.join(cmd)}\n".encode())
            logf.flush()
            child = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                     start_new_session=True)
            print(f"[watchdog] child pid {child.pid}", flush=True)
            while True:
                rc = child.poll()
                if rc is not None:
                    print(f"[watchdog] child exited rc={rc}", flush=True)
                    if rc == 0 or restarts >= args.max_restarts:
                        sys.exit(rc)
                    break  # crashed: relaunch
                m = mtime(args.metrics)
                progressed = m is not None and (
                    started_metrics is None or m > started_metrics)
                ref = m if progressed else None
                budget = args.stall if progressed else args.compile_grace
                last = ref if ref is not None else start
                if time.time() - last > budget:
                    print(f"[watchdog] stalled >{budget}s — killing "
                          f"pid {child.pid} process group", flush=True)
                    try:
                        os.killpg(child.pid, signal.SIGKILL)
                    except OSError:
                        child.kill()
                    child.wait()
                    break
                time.sleep(30)
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] too many restarts, giving up", flush=True)
            sys.exit(1)
        print(f"[watchdog] relaunching (restart {restarts})", flush=True)
        time.sleep(10)


if __name__ == "__main__":
    main()
