"""Precomputed per-symbol codec tables (division-free encoder parameters and
packed decoder lookup tables), built once at setup time in NumPy.

Encoder parameter derivations follow the math documented in the reference:

* BYTE variant: Alverson fixed-point reciprocals so the hot encode step is
  ``q = mulhi32(x, rcp) >> shift; x += bias + q * cmpl_freq``
  (rans_byte.h:174-243, applied at rans_byte.h:258-280).
* RANS64 variant: same scheme with a 64-bit reciprocal whose 128-bit dividend
  is reduced with two chained 64/64 divisions (rans64.h:167-247).
* WORD variant: the reference's fully-unrolled slot tables
  (rans_word_sse41.h:58-72) are replaced in production by the shared
  two-level packing in ops/host_prep.py (cum2sym 4-per-int32 + a per-symbol
  (freq-1|cum) row), which needs fewer gather rows on TPU.

All tables are plain NumPy arrays; the JAX/Pallas kernels receive them as
ordinary device arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import NSYMS

_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF


@dataclasses.dataclass
class ByteEncTables:
    """Struct-of-arrays RansEncSymbol (rans_byte.h:159-165) over 256 symbols."""

    x_max: np.ndarray      # u32: renorm threshold, freq << (l_bits - scale + 8)
    rcp_freq: np.ndarray   # u32 fixed-point reciprocal
    bias: np.ndarray       # u32
    cmpl_freq: np.ndarray  # u32: (1<<scale_bits) - freq
    rcp_shift: np.ndarray  # u32


def build_byte_enc_tables(
    freqs: np.ndarray, cum_freqs: np.ndarray, scale_bits: int, l_bits: int = 23
) -> ByteEncTables:
    """Division-free encode parameters for the 32-bit/8-bit-renorm variant.

    Mirrors RansEncSymbolInit (rans_byte.h:174-243) including the freq<2
    special case: freq==1 cannot use a <1.0 fixed-point reciprocal, so it
    uses rcp=2^32-1, shift=0 (making q = x-1) and folds the correction into
    bias = start + M - 1 (rans_byte.h:199-228).
    """
    assert scale_bits <= 16
    n = NSYMS
    x_max = np.zeros(n, np.uint32)
    rcp_freq = np.zeros(n, np.uint32)
    bias = np.zeros(n, np.uint32)
    cmpl_freq = np.zeros(n, np.uint32)
    rcp_shift = np.zeros(n, np.uint32)
    M = 1 << scale_bits
    for s in range(n):
        freq = int(freqs[s])
        start = int(cum_freqs[s])
        x_max[s] = ((1 << l_bits) >> scale_bits << 8) * freq & _U32
        cmpl_freq[s] = (M - freq) & _U32
        if freq < 2:
            rcp_freq[s] = _U32
            rcp_shift[s] = 0
            bias[s] = (start + M - 1) & _U32
        else:
            shift = 0
            while freq > (1 << shift):
                shift += 1
            rcp_freq[s] = ((1 << (shift + 31)) + freq - 1) // freq & _U32
            rcp_shift[s] = shift - 1
            bias[s] = start
    return ByteEncTables(x_max, rcp_freq, bias, cmpl_freq, rcp_shift)


@dataclasses.dataclass
class Rans64EncTables:
    """Struct-of-arrays Rans64EncSymbol (rans64.h:152-158)."""

    freq: np.ndarray       # u32
    rcp_freq: np.ndarray   # u64
    bias: np.ndarray       # u32
    cmpl_freq: np.ndarray  # u32
    rcp_shift: np.ndarray  # u32


def build_rans64_enc_tables(
    freqs: np.ndarray, cum_freqs: np.ndarray, scale_bits: int
) -> Rans64EncTables:
    """64-bit reciprocal encode parameters (rans64.h:167-247).

    The reciprocal is ceil(2^(shift+63) / freq); the 128-bit dividend is
    reduced with two chained 64/64 divides exactly as rans64.h:230-240
    (python ints make this trivially exact, the split form is kept only in
    spirit).
    """
    assert scale_bits <= 31
    n = NSYMS
    out = Rans64EncTables(
        np.zeros(n, np.uint32),
        np.zeros(n, np.uint64),
        np.zeros(n, np.uint32),
        np.zeros(n, np.uint32),
        np.zeros(n, np.uint32),
    )
    M = 1 << scale_bits
    for s in range(n):
        freq = int(freqs[s])
        start = int(cum_freqs[s])
        out.freq[s] = freq
        out.cmpl_freq[s] = (M - freq) & _U32
        if freq < 2:
            out.rcp_freq[s] = _U64
            out.rcp_shift[s] = 0
            out.bias[s] = (start + M - 1) & _U32
        else:
            shift = 0
            while freq > (1 << shift):
                shift += 1
            out.rcp_freq[s] = ((1 << (shift + 63)) + freq - 1) // freq & _U64
            out.rcp_shift[s] = shift - 1
            out.bias[s] = start
    return out
