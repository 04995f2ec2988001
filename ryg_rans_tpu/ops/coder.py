"""Low-level lane-coder API: the reference's function-level surface as
jit-able jnp ops over arbitrary lane arrays.

Maps 1:1 onto the reference's header API (SURVEY.md §2.1/§2.2); every
function is vectorized over an arbitrary array of independent coder states
and traceable under ``jax.jit``.  States are uint32 (BYTE/WORD/ALIAS) or
uint64 (RANS64); the stream side is functional -- encode steps *return*
emitted words plus per-lane counts, decode renorm *consumes* from a shared
word array at an explicit ordered cursor (the jnp face of the interleave
contract, rans_byte.h:30-35).

| here                     | rans_byte.h / rans64.h                        |
|--------------------------|-----------------------------------------------|
| enc_init                 | RansEncInit :56 / Rans64EncInit :65           |
| enc_renorm               | RansEncRenorm :62 / inline in Rans64EncPut :81|
| enc_put                  | RansEncPut :83 / Rans64EncPut :77 (slow path) |
| enc_flush                | RansEncFlush :93 / Rans64EncFlush :96         |
| dec_init                 | RansDecInit :109 / Rans64DecInit :107         |
| dec_get                  | RansDecGet :125 / Rans64DecGet :118           |
| dec_advance              | RansDecAdvance :133 / Rans64DecAdvance :126   |
| enc_symbol_init          | RansEncSymbolInit :174 / Rans64... :167       |
| dec_symbol_init          | RansDecSymbolInit :246 / Rans64... :250       |
| enc_put_symbol           | RansEncPutSymbol :258 / Rans64EncPutSymbol :262|
| dec_advance_symbol       | RansDecAdvanceSymbol :283                     |
| dec_advance_step         | RansDecAdvanceStep :291                       |
| dec_advance_symbol_step  | RansDecAdvanceSymbolStep :301                 |
| dec_renorm               | RansDecRenorm :307 / Rans64DecRenorm :305     |

``enc_put_symbol`` is the division-free path: Alverson fixed-point
reciprocals (rans_byte.h:229-242) evaluated with 16-bit-limb mulhi
(ops/lanes.mulhi32; 64-bit via four partial products).  Parameters come
from models.tables.build_byte_enc_tables / build_rans64_enc_tables,
including the freq<2 special case (rans_byte.h:199-228).

The Pallas kernels (word_tpu/byte_tpu/rans64_tpu) are the fused,
VMEM-resident production path; this module is the composable one -- build
custom interleavings, inspect states, or prototype new variants with the
same arithmetic.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NSYMS, VariantSpec
from ..models import tables as tables_mod

# uint32/uint64 jnp arithmetic is native here (outside Pallas lanes), so
# states use the natural unsigned dtype per variant.


def _u(spec: VariantSpec):
    return jnp.uint32 if spec.state_bits == 32 else jnp.uint64


# -- encoder ---------------------------------------------------------------


def enc_init(shape, spec: VariantSpec):
    """state <- L (RansEncInit, rans_byte.h:56-59)."""
    return jnp.full(shape, spec.L, _u(spec))


def enc_renorm(x, freq, spec: VariantSpec, scale_bits: int):
    """Bounded masked renorm: emit while x >= x_max = freq << shift.

    Returns (x, words, k): ``words[r]`` is the r-th word in forward/decoder
    order (most-significant first), ``k`` the per-lane emission count
    (0..spec.max_renorm).  Mirrors RansEncRenorm (rans_byte.h:62-74) with
    the loop unrolled to its proven bound.
    """
    u = _u(spec)
    freq = freq.astype(u)
    x_max = freq * u((spec.L >> scale_bits) << spec.word_bits)
    k = jnp.zeros(x.shape, jnp.int32)
    emitted = []
    for _ in range(spec.max_renorm):
        m = x >= x_max
        emitted.append(jnp.where(m, x & u(spec.word_mask), u(0)))
        x = jnp.where(m, x >> u(spec.word_bits), x)
        k = k + m.astype(jnp.int32)
    words = jnp.stack(list(reversed(emitted)))
    return x, words, k


def enc_put(x, sym, freqs, cum_freqs, spec: VariantSpec, scale_bits: int):
    """Slow-path encode step (RansEncPut, rans_byte.h:83-90): renorm then
    ``x <- (x // f) << sb + (x % f) + start``.  Returns (x, words, k)."""
    u = _u(spec)
    f = jnp.asarray(freqs, u)[sym]
    start = jnp.asarray(cum_freqs[:NSYMS], u)[sym]
    return enc_put_raw(x, start, f, spec, scale_bits)


def enc_put_raw(x, start, freq, spec: VariantSpec, scale_bits: int):
    """enc_put with explicit per-lane (start, freq) -- the reference's
    actual RansEncPut signature (rans_byte.h:83), for callers driving a
    custom model rather than the 256-symbol tables."""
    u = _u(spec)
    f = freq.astype(u) if hasattr(freq, "astype") else u(freq)
    s = start.astype(u) if hasattr(start, "astype") else u(start)
    x, words, k = enc_renorm(x, f, spec, scale_bits)
    x = ((x // f) << u(scale_bits)) + (x % f) + s
    return x, words, k


def enc_flush(x, spec: VariantSpec):
    """Serialize final states as little-endian words, lane-major
    (RansEncFlush, rans_byte.h:93-105): out[lane, w] = (x >> w*wb) & mask."""
    u = _u(spec)
    ws = [(x >> u(spec.word_bits * w)) & u(spec.word_mask)
          for w in range(spec.state_words)]
    return jnp.stack(ws, axis=-1)


# -- decoder ---------------------------------------------------------------


def dec_init(head_words, spec: VariantSpec):
    """head_words[lane, w] little-endian -> states (RansDecInit,
    rans_byte.h:109-122)."""
    u = _u(spec)
    x = jnp.zeros(head_words.shape[:-1], u)
    for w in range(spec.state_words):
        x = x | (head_words[..., w].astype(u) << u(spec.word_bits * w))
    return x


def dec_get(x, scale_bits: int):
    """Cumulative-frequency slot (RansDecGet, rans_byte.h:125-128)."""
    return x & x.dtype.type((1 << scale_bits) - 1)


def dec_advance_step(x, start, freq, scale_bits: int):
    """Advance WITHOUT renorm (RansDecAdvanceStep, rans_byte.h:291-298) --
    the pure lane-local half of the interleaving split."""
    u = x.dtype.type
    mask = u((1 << scale_bits) - 1)
    return freq.astype(x.dtype) * (x >> u(scale_bits)) + (x & mask) \
        - start.astype(x.dtype)


def dec_renorm(x, stream, base, spec: VariantSpec):
    """Ordered shared-stream refill (RansDecRenorm, rans_byte.h:307-318).

    ``stream`` is a 1-D word array; lanes refill in flattened lane order
    starting at cursor ``base`` -- the interleave contract the encoder
    produced (SURVEY.md §3.3).  The per-lane word count is closed-form
    (word_bits <= l_bits, see reference_numpy.LaneCoder.dec_need), so
    consumption is a prefix sum, not a loop.  Returns (x, new_base).
    """
    u = _u(spec)
    flat = x.reshape(-1)
    k = jnp.zeros(flat.shape, jnp.int32)
    t = flat
    for _ in range(spec.max_renorm):
        m = t < u(spec.L)
        k = k + m.astype(jnp.int32)
        t = jnp.where(m, t << u(spec.word_bits), t)
    off = base + jnp.cumsum(k) - k
    for r in range(spec.max_renorm):
        m = k > r
        idx = jnp.where(m, off + r, 0)
        w = stream[jnp.minimum(idx, stream.size - 1)].astype(u)
        flat = jnp.where(m, (flat << u(spec.word_bits)) | w, flat)
    return flat.reshape(x.shape), base + jnp.sum(k)


def dec_advance(x, stream, base, start, freq, spec: VariantSpec,
                scale_bits: int):
    """Step + renorm fused (RansDecAdvance, rans_byte.h:133-149)."""
    x = dec_advance_step(x, start, freq, scale_bits)
    return dec_renorm(x, stream, base, spec)


# -- precomputed symbols (division-free encode) ----------------------------


@dataclasses.dataclass(frozen=True)
class EncSymbols:
    """Device-side RansEncSymbol table (rans_byte.h:159-165), SoA."""

    x_max: Any
    rcp_freq: Any
    bias: Any
    cmpl_freq: Any
    rcp_shift: Any
    state_bits: int


def enc_symbol_init(freqs, cum_freqs, scale_bits: int,
                    spec: VariantSpec) -> EncSymbols:
    """Alverson reciprocal parameters (RansEncSymbolInit,
    rans_byte.h:174-243 / rans64.h:167-247) incl. the freq<2 case."""
    if spec.state_bits == 32:
        t = tables_mod.build_byte_enc_tables(freqs, cum_freqs, scale_bits,
                                             l_bits=spec.l_bits)
        u = jnp.uint32
        rcp = jnp.asarray(t.rcp_freq, u)
        # x_max depends on the renorm word width (rans_word_sse41.h:85 uses
        # 16-bit words); the reciprocal parameters don't.
        x_max = (np.asarray(freqs, np.uint64)
                 * ((spec.L >> scale_bits) << spec.word_bits)
                 ).astype(np.uint32)
        return EncSymbols(jnp.asarray(x_max), rcp,
                          jnp.asarray(t.bias, u),
                          jnp.asarray(t.cmpl_freq, u),
                          jnp.asarray(t.rcp_shift, u), 32)
    else:
        t = tables_mod.build_rans64_enc_tables(freqs, cum_freqs, scale_bits)
        u = jnp.uint64
        rcp = jnp.asarray(t.rcp_freq, jnp.uint64)
        # x_max = freq << (63 - scale_bits), uint64
        t_x_max = (np.asarray(t.freq, np.uint64)
                   << np.uint64(63 - scale_bits))
        return EncSymbols(jnp.asarray(t_x_max), rcp,
                          jnp.asarray(t.bias, jnp.uint64),
                          jnp.asarray(t.cmpl_freq, jnp.uint64),
                          jnp.asarray(t.rcp_shift, jnp.uint32), 64)


def dec_symbol_init(freqs, cum_freqs):
    """(start, freq) uint32 pair (RansDecSymbolInit, rans_byte.h:246-252)."""
    return (jnp.asarray(cum_freqs[:NSYMS], jnp.uint32),
            jnp.asarray(freqs, jnp.uint32))


def _mulhi(a, b, bits: int):
    """High half of the unsigned product at the state width (the jnp face
    of Rans64MulHi, rans64.h:31-51; plain widening for 32-bit)."""
    if bits == 32:
        # 16-bit limbs (works without jax_enable_x64; every partial < 2^32)
        u = jnp.uint32
        m16 = u(0xFFFF)
        al, ah = a & m16, a >> u(16)
        bl, bh = b & m16, b >> u(16)
        p_lh = al * bh
        p_hl = ah * bl
        mid = ((al * bl) >> u(16)) + (p_lh & m16) + (p_hl & m16)
        return ah * bh + (p_lh >> u(16)) + (p_hl >> u(16)) + (mid >> u(16))
    # 64x64 -> high 64 via four 32-bit partial products
    u = jnp.uint64
    m32 = u(0xFFFFFFFF)
    al, ah = a & m32, a >> u(32)
    bl, bh = b & m32, b >> u(32)
    p_ll = al * bl
    p_lh = al * bh
    p_hl = ah * bl
    p_hh = ah * bh
    mid = (p_ll >> u(32)) + (p_lh & m32) + (p_hl & m32)
    return p_hh + (p_lh >> u(32)) + (p_hl >> u(32)) + (mid >> u(32))


def enc_put_symbol(x, sym, esyms: EncSymbols, spec: VariantSpec,
                   scale_bits: int):
    """Division-free encode step (RansEncPutSymbol, rans_byte.h:258-280):
    renorm, then ``q = mulhi(x, rcp) >> shift; x += bias + q * cmpl_freq``.
    Returns (x, words, k)."""
    u = _u(spec)
    x_max = esyms.x_max[sym]
    k = jnp.zeros(x.shape, jnp.int32)
    emitted = []
    for _ in range(spec.max_renorm):
        m = x >= x_max
        emitted.append(jnp.where(m, x & u(spec.word_mask), u(0)))
        x = jnp.where(m, x >> u(spec.word_bits), x)
        k = k + m.astype(jnp.int32)
    words = jnp.stack(list(reversed(emitted)))
    q = _mulhi(x, esyms.rcp_freq[sym], spec.state_bits) \
        >> esyms.rcp_shift[sym].astype(u)
    x = x + esyms.bias[sym] + q * esyms.cmpl_freq[sym]
    return x, words, k


def dec_advance_symbol(x, stream, base, starts, freqs, sym,
                       spec: VariantSpec, scale_bits: int):
    """RansDecAdvanceSymbol (rans_byte.h:283-286)."""
    return dec_advance(x, stream, base, starts[sym], freqs[sym], spec,
                       scale_bits)


def dec_advance_symbol_step(x, starts, freqs, sym, scale_bits: int):
    """RansDecAdvanceSymbolStep (rans_byte.h:301-304)."""
    return dec_advance_step(x, starts[sym], freqs[sym], scale_bits)
