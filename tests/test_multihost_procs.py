"""True multi-process multihost test: two OS processes coordinate over
localhost (jax.distributed on CPU), each owning half the blocks, and the
fixed-capacity padded allgather reassembles the full container on both —
the DCN-gather path (parallel/multihost.py) exercised for real, not just
in its single-process degenerate form."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=n, process_id=pid)
import numpy as np
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.parallel import multihost

assert multihost.process_count() == n
cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=128,
                 lanes_per_stream=128, block_symbols=2048)
rng = np.random.default_rng(7)
for n_blocks in (4, 5):   # even split AND ragged (5 blocks / 2 procs)
    data = rng.integers(0, 256, n_blocks * cfg.block_symbols, dtype=np.uint8)
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    payloads = multihost.compress_multihost(data, cfg, freqs, cum,
                                            interpret=True)
    assert len(payloads) == n_blocks
    out = multihost.decompress_multihost(payloads, cfg, data.size, freqs,
                                         cum, interpret=True)
    assert np.array_equal(out[:data.size], data)
print("MULTIHOST_OK", pid, flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_multihost_roundtrip(tmp_path):
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(tmp_path)) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert f"MULTIHOST_OK {i}" in out, f"worker {i}:\n{out[-2000:]}"
