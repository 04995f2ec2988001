"""Order-0 static probability model with exact reference integer semantics.

Reproduces the behavior of ``SymbolStats`` in the reference demos
(main.cpp:49-129, duplicated in main64.cpp / main_simd.cpp / main_alias.cpp):
histogram -> exclusive prefix sum -> integer renormalization to a power-of-two
total with a "steal one slot from the smallest freq>1 symbol" fixup.  The
integer truncation and the steal scan order must match the reference exactly
for byte-identical compressed streams, so the fixup is implemented as the same
sequential sweep rather than a vectorized approximation.

The histogram itself is also provided as a JAX function so frequency counting
can run sharded on device for large corpora (the only part of modeling that
touches the full input).
"""

from __future__ import annotations

import numpy as np

from ..config import NSYMS


def count_freqs(data: np.ndarray) -> np.ndarray:
    """256-bin byte histogram (main.cpp:59-66).

    Chunked: np.bincount materializes an intp copy of its input, and the
    ~1 GB temp for a 128 MB corpus thrashes small hosts (measured 29.5s
    whole-array vs 0.8s in 16 MiB chunks on the r5 bench host) -- the
    chunk loop is pure win at every size."""
    data = np.asarray(data).ravel()
    if data.dtype != np.uint8:
        data = data.astype(np.uint8)
    out = np.zeros(NSYMS, np.int64)
    step = 1 << 24
    for off in range(0, data.size, step):
        out += np.bincount(data[off:off + step], minlength=NSYMS)
    return out.astype(np.uint32)


def calc_cum_freqs(freqs: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum -> cum_freqs[257] (main.cpp:68-73)."""
    cum = np.zeros(NSYMS + 1, dtype=np.uint64)
    np.cumsum(freqs.astype(np.uint64), out=cum[1:])
    return cum


def normalize_freqs(
    freqs: np.ndarray, target_total: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rescale ``freqs`` so they sum to ``target_total`` (a power of two).

    Exact re-derivation of main.cpp:75-129:

    * each cumulative count is mapped through
      ``(target_total * cum) // cur_total`` in 64-bit integer math
      (main.cpp:83-84);
    * any symbol with a nonzero raw count whose scaled frequency rounded to
      zero steals one slot from the currently-smallest symbol with freq > 1,
      scanning j = 0..255 and keeping the first minimum (main.cpp:90-116) --
      the scan order matters for tie-breaking and is preserved;
    * frequencies are re-derived from the adjusted cumulative array
      (main.cpp:127).

    Returns ``(freqs[256], cum_freqs[257])`` as uint32/uint64 arrays.
    """
    freqs = np.asarray(freqs, dtype=np.uint64)
    if target_total < NSYMS:
        raise ValueError("target_total must be >= 256")
    cum = calc_cum_freqs(freqs)
    cur_total = int(cum[NSYMS])
    if cur_total == 0:
        raise ValueError("cannot model an empty input")

    cum = (int(target_total) * cum) // cur_total  # exact 64-bit truncation

    for i in range(NSYMS):
        if freqs[i] and cum[i + 1] == cum[i]:
            # Symbol i rounded to zero: steal one slot from the first
            # smallest freq>1 symbol, shifting the cum range between them.
            step_freqs = cum[1:] - cum[:-1]
            candidates = np.where(step_freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("no symbol to steal frequency from")
            best_steal = int(candidates[np.argmin(step_freqs[candidates])])
            # np.argmin returns the first minimum, matching the reference's
            # `freq < best_freq` strict-compare scan (main.cpp:97-103).
            if best_steal < i:
                cum[best_steal + 1:i + 1] -= 1
            else:
                cum[i + 1:best_steal + 1] += 1

    assert cum[0] == 0 and cum[NSYMS] == target_total
    new_freqs = (cum[1:] - cum[:-1]).astype(np.uint32)
    zero_raw = freqs == 0
    assert np.all(new_freqs[zero_raw] == 0)
    assert np.all(new_freqs[~zero_raw] > 0)
    return new_freqs, cum


def build_model(data: np.ndarray, prob_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """count + normalize in one call -> (freqs, cum_freqs)."""
    return normalize_freqs(count_freqs(data), 1 << prob_bits)


def build_model_from_counts(counts: np.ndarray,
                            prob_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """normalize a precomputed 256-bin histogram (streaming/sharded model
    building) -> (freqs, cum_freqs)."""
    return normalize_freqs(np.asarray(counts, np.uint64), 1 << prob_bits)


def cum2sym(cum_freqs: np.ndarray, prob_bits: int) -> np.ndarray:
    """Linear slot->symbol table (main.cpp:145-148), vectorized.

    ``cum2sym[slot] = s`` for ``cum_freqs[s] <= slot < cum_freqs[s+1]``.
    Equivalent to the reference's brute-force fill; computed here as a
    searchsorted over the cumulative table.
    """
    M = 1 << prob_bits
    slots = np.arange(M, dtype=np.uint64)
    # side='right' maps slot==cum[s] to symbol s (first symbol whose
    # half-open range contains the slot).
    table = np.searchsorted(cum_freqs[1:], slots, side="right")
    return table.astype(np.uint8)


def count_freqs_jax(data, nsyms: int = NSYMS):
    """Device-side histogram for sharded model building.

    One `jnp` segment-sum per shard; callers `psum` the result across the
    data mesh axis (replaces main.cpp:59-66 for multi-chip corpora).
    """
    import jax.numpy as jnp

    data = data.astype(jnp.int32)
    return jnp.zeros((nsyms,), jnp.int32).at[data].add(1)
