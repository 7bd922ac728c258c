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


def _run_check(name: str, timeout: int = 2700) -> dict:
    # conftest.py exports JAX_PLATFORMS=cpu and the virtual-device
    # XLA_FLAGS into os.environ (the pytest process must stay on CPU); the
    # on-chip subprocess must NOT inherit those. PYTHONPATH is KEPT — on
    # this image it carries the TPU plugin site (/root/.axon_site).
    # EMMAX_TPU_PLATFORM overrides the platform ("axon" on this relay
    # image, "tpu" on a real TPU-VM); unset lets jax auto-select.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    if os.environ.get("EMMAX_TPU_PLATFORM"):
        env["JAX_PLATFORMS"] = os.environ["EMMAX_TPU_PLATFORM"]
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
    # teacher-forced argmax over 256 positions. Random gaussian weights are
    # the quantization worst case (near-zero margins — see the 7B gate in
    # BENCHMARKS.md), so the contract is ordering + a loose int8 floor, not
    # near-exactness: int8 stays usable, int4 must not beat it.
    assert out["int8_agree"] >= 0.60, out
    assert out["int8_agree"] >= out["int4_agree"], out
    assert out["int8_rmse"] <= out["int4_rmse"], out


def test_paged_kernel_matches_gather_on_chip():
    out = _run_check("paged_parity")
    assert out["match"], out


def test_flash_fused_bwd_on_chip():
    out = _run_check("flash_fused_bwd")
    assert out["match"], out
