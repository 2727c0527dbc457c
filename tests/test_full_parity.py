"""Run the live A/B parity check against the executing reference.

Covers every cell of every column on both experiment databases — the
strongest parity statement we can make (found two real bugs on first
run: pathlib './' normalization and NULL-in-sqrt collapsing to 0.0).
"""

import os
import subprocess
import sys


def test_full_reference_parity():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parity_check.py")],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PARITY OK" in proc.stdout
