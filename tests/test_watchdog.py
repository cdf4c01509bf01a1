"""benchmarks/tpu_watchdog.py stall/relaunch semantics.

The watchdog became load-bearing infrastructure in round 4 (every long
TPU run survives the degraded tunnel through it), so its kill/relaunch
logic gets a real test: children are tiny shell scripts, stalls are
simulated by (not) touching the metrics file.
"""

import os
import subprocess
import sys
import time

import pytest

WATCHDOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "tpu_watchdog.py")


def run_watchdog(tmp_path, child_script, stall, grace, max_restarts=2,
                 timeout=120):
    log = tmp_path / "child.log"
    metrics = tmp_path / "metrics.jsonl"
    child = tmp_path / "child.sh"
    child.write_text(child_script)
    child.chmod(0o755)
    proc = subprocess.run(
        [sys.executable, WATCHDOG, "--log", str(log),
         "--metrics", str(metrics), "--stall", str(stall),
         "--compile_grace", str(grace),
         "--max_restarts", str(max_restarts),
         "--", "bash", str(child)],
        capture_output=True, text=True, timeout=timeout,
    )
    return proc, log, metrics


class TestWatchdog:
    def test_clean_exit_passes_through(self, tmp_path):
        """A child that finishes normally (writing progress) ends the
        watchdog with rc=0 and no relaunch."""
        proc, log, metrics = run_watchdog(
            tmp_path,
            f"#!/bin/bash\nfor i in 1 2 3; do echo x >> {tmp_path}/metrics.jsonl; sleep 1; done\n",
            stall=60, grace=60)
        assert proc.returncode == 0
        assert proc.stdout.count("relaunching") == 0

    @pytest.mark.slow
    def test_failing_child_is_relaunched(self, tmp_path):
        """A crashing child (rc!=0) is relaunched up to max_restarts; the
        watchdog then exits with the child's rc."""
        marker = tmp_path / "count"
        proc, log, metrics = run_watchdog(
            tmp_path,
            "#!/bin/bash\n"
            f"echo . >> {marker}\n"
            f"if [ $(wc -l < {marker}) -ge 2 ]; then "
            f"echo x >> {tmp_path}/metrics.jsonl; exit 0; fi\n"
            "exit 3\n",
            stall=60, grace=60)
        # first attempt crashes (rc=3), relaunch succeeds -> overall rc 0
        assert proc.returncode == 0
        assert "relaunching" in proc.stdout
        assert marker.read_text().count(".") == 2

    @pytest.mark.slow
    def test_stalled_child_is_killed_and_relaunched(self, tmp_path):
        """A child that writes one metric then hangs is killed after the
        stall budget and relaunched (the tunnel-wedge recovery path)."""
        marker = tmp_path / "count"
        proc, log, metrics = run_watchdog(
            tmp_path,
            "#!/bin/bash\n"
            f"echo . >> {marker}\n"
            f"echo x >> {tmp_path}/metrics.jsonl\n"
            f"if [ $(wc -l < {marker}) -ge 2 ]; then exit 0; fi\n"
            "sleep 600\n",  # simulated wedge: progress stops
            stall=3, grace=60, timeout=180)
        assert proc.returncode == 0
        assert "stalled" in proc.stdout
        assert marker.read_text().count(".") == 2
