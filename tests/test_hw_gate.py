"""Opt-in hardware gate: run the compiled (variant, prob_bits) round-trip
matrix on a real TPU via `pytest -m hw`.

The regular suite pins JAX_PLATFORMS=cpu (conftest.py) and runs the Pallas
kernels in interpret mode, which cannot catch compile-only failures (Mosaic
lowering rules, MXU bf16 truncation, VMEM budgets -- docs/DESIGN.md).  This
test launches benchmarks/hw_matrix.py in a SUBPROCESS with the repo's
default platform (axon/TPU) so the in-process CPU pin doesn't leak into it,
mirroring the reference's posture that every demo run self-verifies on the
actual hardware (main.cpp:211-214).
"""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_available() -> bool:
    """Probe for a real accelerator in a clean subprocess (the current
    process is CPU-pinned by conftest)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; import sys; "
         "sys.exit(0 if jax.default_backend() != 'cpu' else 1)"],
        env=env, capture_output=True, timeout=120)
    return r.returncode == 0


@pytest.mark.hw
def test_compiled_matrix(tmp_path):
    if not _tpu_available():
        pytest.skip("no TPU attached")
    out = tmp_path / "hw_matrix.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "benchmarks", "hw_matrix.py"),
         str(out)],
        env=env, timeout=3600)
    assert r.returncode == 0, "hw matrix reported failures (see stdout)"
    result = json.loads(out.read_text())
    assert result["ok"] == result["total"]
    failed = [r for r in result["rows"] if not r["ok"]]
    assert not failed, f"compiled round-trip failures: {failed}"
