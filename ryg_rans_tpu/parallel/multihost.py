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


def block_range_of(n_blocks: int, pi: int, np_: int) -> tuple[int, int]:
    """Contiguous block interval owned by process ``pi`` of ``np_``.

    Ragged counts are allowed: the first ``n_blocks mod np_`` processes own
    one extra block, so ownership stays contiguous and block-major (the
    gather is order-preserving).  Deterministic from (n_blocks, np_), so
    every process can compute every other process's slice without
    communication."""
    base, rem = divmod(n_blocks, np_)
    lo = pi * base + min(pi, rem)
    return lo, lo + base + (1 if pi < rem else 0)


def local_block_range(n_blocks: int) -> tuple[int, int]:
    """Block interval owned by THIS process (see block_range_of)."""
    return block_range_of(n_blocks, process_index(), process_count())


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

    dt = local_payloads[0].dtype if local_payloads else np.uint16
    n_local = len(local_payloads)
    # Ragged ownership: processes may hold different block counts, but
    # allgather needs one static shape -- pad the row dimension to the
    # global max and mark pad rows with count -1.
    n_rows = int(np.asarray(multihost_utils.process_allgather(
        np.array([n_local], np.int64))).max())
    counts = np.full(n_rows, -1, np.int64)
    counts[:n_local] = [p.size for p in local_payloads]
    buf = np.zeros((n_rows, cap_words), dt)
    for i, p in enumerate(local_payloads):
        buf[i, :p.size] = p
    all_counts = np.asarray(multihost_utils.process_allgather(counts))
    all_buf = np.asarray(multihost_utils.process_allgather(buf))
    all_counts = all_counts.reshape(-1)
    all_buf = all_buf.reshape(-1, cap_words)
    return [all_buf[i, :int(c)].copy()
            for i, c in enumerate(all_counts) if c >= 0]


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
    if hi > lo:
        blocks, _ = _tpu_mod(cfg).encode(cfg, local, freqs, cum,
                                         interpret=interpret)
    else:  # ragged: more processes than blocks -> this one owns none
        blocks = []
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
    if hi > lo:
        local_syms = min(hi * B, n_symbols_padded) - lo * B
        out = _tpu_mod(cfg).decode(cfg, payloads[lo:hi], local_syms, freqs,
                                   cum, interpret=interpret)
    else:  # ragged: this process owns no blocks
        out = np.zeros(0, np.uint8)
    P = process_count()
    if P == 1:
        return out
    from jax.experimental import multihost_utils

    # Uniform gather capacity (ragged ownership => per-process sizes
    # differ); reassemble by each process's deterministic block span.
    per_max = -(-n_blocks // P)
    buf = np.zeros(B * per_max, np.uint8)
    buf[:out.size] = out
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(P, -1)
    parts = []
    for p in range(P):
        plo, phi = block_range_of(n_blocks, p, P)
        n_syms = max(0, min(phi * B, n_symbols_padded) - plo * B)
        parts.append(gathered[p, :n_syms])
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)
