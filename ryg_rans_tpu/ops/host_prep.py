"""Host-side helpers shared by the per-variant TPU kernel modules.

Table packing and block arithmetic used identically by byte_tpu /
rans64_tpu / word_tpu; kept in one place because the packed layouts are
part of the frozen stream format contract (docs/FORMAT.md) and must not
diverge between variants.
"""

from __future__ import annotations

import numpy as np

from ..config import RansConfig
from ..models import stats as stats_mod


def pack_sym4_fc(freqs, cum_freqs, sb: int):
    """Two-level decode tables: cum2sym packed 4 symbols/int32 as
    (M/512, 128) rows, plus per-symbol (freq << 16) | cum as (2,128)."""
    c2s = stats_mod.cum2sym(cum_freqs, sb).astype(np.uint32)
    s4 = (c2s[0::4] | (c2s[1::4] << 8) | (c2s[2::4] << 16)
          | (c2s[3::4] << 24))
    sym4_rows = s4.view(np.int32).reshape(-1, 128)
    fc = (np.asarray(freqs, np.uint32) << 16) \
        | np.asarray(cum_freqs[:256], np.uint32)
    fc_rows = fc.view(np.int32).reshape(2, 128)
    return sym4_rows, fc_rows


def pack_enc_fc_minus1(freqs, cum_freqs) -> np.ndarray:
    """Per-symbol ((freq-1) << 16) | cum as (2,128) int32 (freq-1 so
    freq = 2^16 at prob_bits 16 still fits 16 bits)."""
    f = np.maximum(np.asarray(freqs, np.uint32), 1) - 1
    c = np.asarray(cum_freqs[:256], np.uint32)
    return ((f << 16) | c).view(np.int32).reshape(2, 128)


def default_interpret() -> bool:
    import jax
    return jax.default_backend() != "tpu"


def split_blocks(cfg: RansConfig, padded_size: int):
    """(n_full_blocks, tail_symbols); all sizes multiples of 4*n_lanes."""
    B = cfg.block_symbols
    n_full = padded_size // B
    return n_full, padded_size - n_full * B
