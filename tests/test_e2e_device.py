"""The device-resident e2e pipeline (decode -> consume -> re-encode ->
compact inside one jit, benchmarks/bench_e2e_device.py) must stay
runnable and byte-exact -- it backs the committed E2E_DEVICE artifact.

Runs the script's --tiny interpret-mode path in a subprocess (the script
pins jax to CPU itself in tiny mode), at both the artifact's prob_bits
and the default, so the --pb knob keeps working.
"""

import json
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = ROOT / "benchmarks" / "bench_e2e_device.py"


@pytest.mark.parametrize("pb", [
    11, pytest.param(12, marks=pytest.mark.slow)])
def test_tiny_pipeline_roundtrips(pb):
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--tiny", "--pb", str(pb)],
        capture_output=True, text=True, timeout=600, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec == {"metric": "e2e_device_tiny_ok", "value": 1}
    # the byte-exactness gate printed before any timing
    assert "byte-exact" in out.stderr


def test_artifact_prob_bits_matches_script_support():
    """The committed artifact's config must be one the script accepts."""
    art = json.loads((ROOT / "E2E_DEVICE_r04.json").read_text())
    assert art["variant"] == "WORD"
    assert 9 <= art["prob_bits"] <= 15  # WORD kernel range
    assert art["value"] >= 10.0  # the >=10 GB/s north star, end-to-end
