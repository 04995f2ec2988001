"""Multi-host orchestration: per-process block ownership + ordered gather.

The reference is single-process (SURVEY.md §2.8); scale-out across hosts is
pure data parallelism over container blocks.  Design (SURVEY.md §5
"distributed communication backend"):

* the 256-entry frequency table is built from per-shard histograms with one
  psum (parallel.mesh.build_model_sharded) and replicated everywhere;
* each process en/decodes the blocks its local devices own with ZERO
  communication in the hot loop;
* payloads cross DCN exactly once, at container assembly/distribution, via
  a fixed-capacity padded allgather (variable-length streams + counts).

Single-process (the common case, incl. tests) degenerates to a no-op
gather, so the same code path runs everywhere.
"""

from __future__ import annotations

import numpy as np

from ..config import RansConfig


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def local_block_range(n_blocks: int) -> tuple[int, int]:
    """Contiguous block interval owned by this process (block-major order,
    matching the container layout so the gather is order-preserving)."""
    np_, pi = process_count(), process_index()
    if n_blocks % np_:
        raise ValueError(f"n_blocks={n_blocks} not divisible by "
                         f"{np_} processes")
    per = n_blocks // np_
    return pi * per, (pi + 1) * per


def allgather_payloads(local_payloads: list[np.ndarray],
                       cap_words: int) -> list[np.ndarray]:
    """Gather per-block word arrays from every process in block order.

    Streams are variable-length, so they travel as (counts, padded buffer)
    through one allgather each; capacity is the static per-block worst case
    (the same bound the kernels use).  Returns the full ordered block list.
    """
    if process_count() == 1:
        return list(local_payloads)
    from jax.experimental import multihost_utils

    dt = local_payloads[0].dtype
    n_local = len(local_payloads)
    counts = np.array([p.size for p in local_payloads], np.int64)
    buf = np.zeros((n_local, cap_words), dt)
    for i, p in enumerate(local_payloads):
        buf[i, :p.size] = p
    all_counts = np.asarray(multihost_utils.process_allgather(counts))
    all_buf = np.asarray(multihost_utils.process_allgather(buf))
    all_counts = all_counts.reshape(-1)
    all_buf = all_buf.reshape(-1, cap_words)
    return [all_buf[i, :int(all_counts[i])].copy()
            for i in range(all_counts.size)]


def compress_multihost(data: np.ndarray, cfg: RansConfig, freqs, cum,
                       interpret: bool = False) -> list[np.ndarray]:
    """Encode ``data`` (replicated host array, padded to whole blocks) with
    this process owning its contiguous block slice; returns the full
    ordered per-block payload list on every process."""
    from ..api import _tpu_mod

    B = cfg.block_symbols
    if data.size % B:
        raise ValueError("data must be padded to whole blocks")
    n_blocks = data.size // B
    lo, hi = local_block_range(n_blocks)
    local = data[lo * B:hi * B]
    blocks, _ = _tpu_mod(cfg).encode(cfg, local, freqs, cum,
                                     interpret=interpret)
    spec = cfg.spec
    cap = B * spec.max_renorm + cfg.n_lanes * spec.state_words
    return allgather_payloads(blocks, cap)


def decompress_multihost(payloads: list[np.ndarray], cfg: RansConfig,
                         n_symbols_padded: int, freqs, cum,
                         interpret: bool = False) -> np.ndarray:
    """Decode with per-process block ownership; returns the full symbol
    array on every process (ordered gather over DCN)."""
    from ..api import _tpu_mod

    B = cfg.block_symbols
    n_blocks = len(payloads)
    lo, hi = local_block_range(n_blocks)
    local_syms = min(hi * B, n_symbols_padded) - lo * B
    out = _tpu_mod(cfg).decode(cfg, payloads[lo:hi], local_syms, freqs, cum,
                               interpret=interpret)
    if process_count() == 1:
        return out
    from jax.experimental import multihost_utils

    cap = B * (hi - lo)
    buf = np.zeros(cap, np.uint8)
    buf[:out.size] = out
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return gathered.reshape(-1)[:n_symbols_padded]
