"""TPU-gated on-chip checks (VERDICT r2 item 4's "TPU-gated test").

These tests subprocess onto the REAL TPU (the pytest process itself is
pinned to CPU by conftest.py) and are gated behind ``EMMAX_TPU_TESTS=1`` so
the default CPU suite stays hermetic and fast:

    EMMAX_TPU_TESTS=1 python -m pytest tests/test_tpu_gated.py -v

Run them one at a time — two TPU processes trip FAILED_PRECONDITION on the
remote chip.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("EMMAX_TPU_TESTS") != "1",
    reason="set EMMAX_TPU_TESTS=1 to run on-chip checks (one at a time)")

REPO = Path(__file__).resolve().parent.parent


def _run_check(name: str, timeout: int = 900) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_checks.py"), name],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO)
    assert res.returncode == 0, res.stdout + res.stderr
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_quant_quality_on_chip():
    out = _run_check("quant_small")
    assert "TPU" in out["backend"] or "Tpu" in out["backend"], out
    # int8 per-channel should track bf16 greedy almost exactly on a small
    # model; int4 group-128 may diverge late in the rollout
    assert out["int8_agree"] >= 0.95, out
    assert out["int4_agree"] >= 0.75, out


def test_paged_kernel_matches_gather_on_chip():
    out = _run_check("paged_parity")
    assert out["match"], out
