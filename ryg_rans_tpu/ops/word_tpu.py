"""Flagship TPU codec: word-based rANS (16-bit renorm) over thousands of
Pallas vector lanes, block-parallel over a grid.

TPU-native re-design of the reference's SIMD decoder (rans_word_sse41.h):

* the reference's 8 interleaved states in two SSE registers become
  ``N = R * 128`` states in R vreg rows (R=32 -> 4096 lanes);
* its two-table slot lookup (slots[] + slot2sym[], rans_word_sse41.h:58-61)
  becomes a two-level packed lookup -- cum2sym 4 symbols/int32 plus a
  per-symbol (freq-1|cum) row (ops/host_prep.pack_sym4_fc), which needs
  3x fewer gather rows than a one-level slot table;
* its movemask + shuffle-LUT renorm (rans_word_sse41.h:182-227) becomes a
  branchless mask -> triangular-matmul prefix sum (MXU) -> window gather;
* the encoder, scalar in the reference (main_simd.cpp:306), is vectorized
  here too: dense per-step emission from the Pallas kernel followed by an
  XLA prefix-sum compaction, with exact division done as an fp32 estimate
  plus integer fixup (ops/lanes.exact_div);
* independent fixed-size blocks map onto the Pallas grid; block buffers live
  in HBM and are staged through VMEM per grid step (double-buffered by the
  Pallas pipeline), which is the kernel-level face of the framework's
  block-data-parallel scale-out (parallel/).

Blocks are padded to a multiple of 4*N symbols with the most frequent
symbol so every kernel step is full (no tail masking in the hot loop); the
container records the true length.  Symbols travel packed 4-per-int32.

The stream format is identical to the oracle/native format with
``lanes_per_stream == n_lanes`` (one substream per block): [2N u16 state
words, lane-ascending lo/hi] ++ [renorm words, (step asc, lane asc)].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RansConfig, Variant
from . import host_prep
from . import lanes

# ---------------------------------------------------------------------------
# Table packing (host side)
# ---------------------------------------------------------------------------


def pack_dec_rows2(freqs, cum_freqs, scale_bits: int):
    """Two-level decode tables minimizing gather rows.

    Level 1: cum2sym packed 4 symbols per int32 -> (M/512, 128) rows.
    Level 2: per-symbol (freq << 16) | cum -> (2, 128) rows.
    The decoder recovers bias as slot - cum[sym] instead of storing it
    (rans_word_sse41.h:64-72 bakes bias per slot; recomputing trades one
    subtract for 3x fewer gather rows).  Shared layout: ops/host_prep.py.
    """
    return host_prep.pack_sym4_fc(freqs, cum_freqs, scale_bits)


def pack_enc_rows(freqs, cum_freqs, scale_bits: int) -> np.ndarray:
    """Per-symbol encode table (freq << 16) | start as (2,128) int32.

    scale_bits <= 15 keeps freq (<= 2^15) exact in the 16-bit field even
    for the degenerate single-symbol model."""
    assert scale_bits <= 15
    f = np.asarray(freqs, np.uint32)
    c = np.asarray(cum_freqs[:256], np.uint32)
    packed = (f << 16) | c
    return packed.view(np.int32).reshape(2, 128)


def _supports(cfg: RansConfig):
    if cfg.variant != Variant.WORD:
        raise ValueError("word_tpu handles the WORD variant")
    if not 9 <= cfg.prob_bits <= 15:
        raise ValueError("TPU word kernel needs 9 <= prob_bits <= 15 "
                         "(the reference fixes 12, rans_word_sse41.h:37; "
                         "15 keeps freq<<16 packing exact)")
    if cfg.n_lanes % 128 or cfg.n_lanes < 128:
        raise ValueError("TPU word kernel needs n_lanes to be a multiple of 128")
    # Compiled multi-block grids slice (R,128)-row blocks, and Mosaic requires
    # sliced sublane extents to be multiples of 8 -> R % 8 == 0 on hardware.
    # (Interpret mode used in CPU tests accepts any R.)
    if cfg.lanes_per_stream != cfg.n_lanes:
        raise ValueError("TPU word kernel uses one substream per block")
    if cfg.block_symbols % (4 * cfg.n_lanes):
        raise ValueError("TPU kernels need block_symbols to be a multiple "
                         "of 4*n_lanes (symbols travel 4-packed per int32)")


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------


def wmax_rows(R: int) -> int:
    """Worst-case window span in pair-rows (all N lanes renorm in one step:
    N words = R/2 rows, +1 for the base offset), rounded to 8 sublanes for
    Mosaic-legal dynamic slices."""
    return -(-((R + 1) // 2 + 2) // 8) * 8


def decode_cap_rows(max_words: int, R: int) -> int:
    """Stream buffer capacity (pair-rows) for a block of ``max_words`` total
    words: body + the kernel's window span of overread pad (the Pallas
    analog of the reference's +16B SIMD pad, main_simd.cpp:145-146)."""
    N = R * 128
    body_rows = max(0, -(-(max_words - 2 * N) // 256))
    return -(-(body_rows + wmax_rows(R) + 1) // 8) * 8 \
        + lanes.BP_WINDOW_PAD_ROWS  # bp fetch loads an 8-aligned window


def _decode_kernel(*refs, T4: int, R: int, sb: int, groups: int = 1,
                   ilp: int = 1, use_bisect: bool | None = None,
                   slot_direct: bool = False, hoist4: bool = False,
                   bp: bool = True, ablate: str = "", i8s: bool = False):
    # ``ablate`` is a BENCHMARK-ONLY stage-stub hook for the ablation
    # roofline (benchmarks/roofline_r64.py pattern; docs/DESIGN.md).
    # Values: "lookup" | "fetch" | "scan".  Ablated kernels do NOT
    # round-trip.
    """Decode one block: 4*T4 steps over (R,128) lanes.

    Gather-count-optimized (see docs/DESIGN.md):
    * two-level symbol lookup -- cum2sym packed 4/int32 (M/512 rows) then a
      2-row (freq|cum) gather -- instead of the 1-level M/128-row slot
      table (sym4 path; bisect with hoisted constant keys at pb >= 14);
    * renorm words packed 2/int32 in the window buffer, halving window rows;
    * the stream window is fetched with the monotone two-candidate MXU
      gather (lanes.window_fetch_mono), O(1) in window span.
    """
    if bp:  # byte-plane window scratches are the LAST 4 refs (scratch)
        refs, plane_refs = refs[:-4], refs[-4:]
    s4rows = (1 << sb) // 128 if slot_direct else (1 << sb) // 512
    bisect = (not slot_direct) and (
        use_bisect if use_bisect is not None else s4rows > 16)
    if bisect:  # bisect path needs no cum2sym table in VMEM
        fc_ref, x0_ref, stream2_ref, out_ref = refs
    else:
        sym4_ref, fc_ref, x0_ref, stream2_ref, out_ref = refs
        sym4 = sym4_ref[:]
    if bp:  # hoist the stream's byte-plane split out of the symbol loop
        lanes.fill_byte_planes(plane_refs, stream2_ref[:])
    fc = fc_ref[:]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(jnp.int8 if i8s else jnp.float32)
    M1 = (1 << sb) - 1
    WMAX = wmax_rows(R)       # worst-case pair-rows a step can touch
    cap_rows = stream2_ref.shape[0] // ilp
    # loop-invariant first-level bisect keys (lanes.bisect_consts)
    bconsts = lanes.bisect_consts(fc[2:4], (R, 128), fused=True,
                                  levels=4 if hoist4 else 3) \
        if bisect else None

    def substep(x, base, spk, k, woff):
        slot = x & M1
        if ablate == "lookup":
            sym = slot & 0xFF
            freq = (slot & 0x3FF) | 1
            off = slot & 1
        elif bisect:
            # binary search on FUSED (cum[s+1]<<sb)|(freq-1) keys beats
            # the 4-packed cum2sym sweep once the slot table exceeds 16
            # rows (prob_bits >= 14); WORD's sb <= 15 always, so the
            # search itself yields (freq, cum) -- no fc gather (lanes.py)
            sym, freq, cumv = lanes.cum2sym_bisect_fused(
                fc[2:4], slot, sb, (R, 128), consts=bconsts)
            off = slot - cumv
        elif slot_direct:
            # one-level slot-direct table (host_prep.pack_slot_direct,
            # sb <= 12): sym:8 | freq-1:sb | (slot-cum):sb per slot --
            # every row gather independent, no dependent fc lookup
            e = lanes.table_lookup(sym4, slot, s4rows, (R, 128))
            sym = e & 0xFF
            freq = (lanes.srl(e, 8) & M1) + 1
            off = lanes.srl(e, 8 + sb)
        else:
            # two-level symbol lookup
            s4 = lanes.table_lookup(sym4, lanes.srl(slot, 2), s4rows,
                                    (R, 128))
            sym = lanes.srl(s4, (slot & 3) << 3) & 0xFF
            e = lanes.table_lookup(fc, sym, 2, (R, 128))
            freq = lanes.srl(e, 16) + 1  # fc packs freq-1 (host_prep)
            off = slot - (e & 0xFFFF)
        spk = spk | (sym << (8 * k))
        # advance: x = freq*(x>>sb) + (slot - cum)  (rans_word_sse41.h:126)
        x = freq * lanes.srl(x, sb) + off
        # renorm (<=1 word, rans_word_sse41.h:31-34): monotone
        # two-candidate window fetch via MXU one-hots -- a row of 128
        # lanes consumes <=128 words < 256 words/window-row, so rel
        # spans at most two rows per sublane row (lanes.py)
        m = lanes.ult(x, 1 << 16)
        if ablate == "scan":
            x = jnp.where(m, (x << 16) | 1, x)
            return x, base + 1, spk
        if i8s:  # int8 prefix scan hook (r5: pb11 A/B/A read +2%
            # but pb12 LOSES 20% -- 11.95 vs 14.88 at ilp2 -- so the
            # default stays f32; exact either way, lanes.py)
            incl, total, rowstart = lanes.lane_prefix_sum_rows_i8(
                m.astype(jnp.int8), tri, R)
        else:
            incl, total, rowstart = lanes.lane_prefix_sum_rows(
                m.astype(jnp.float32), tri, R)
        gidx = base + jnp.where(m, incl - 1, 0)
        brow = jax.lax.shift_right_logical(base, 8)
        rel = jax.lax.shift_right_logical(gidx, 8) - brow
        row_rel = jax.lax.shift_right_logical(base + rowstart, 8) - brow
        col = jax.lax.shift_right_logical(gidx, 1) & 127
        half = (gidx & 1) << 4
        if ablate == "fetch":
            wv = incl ^ x
        elif bp:
            # int8 dynamic loads need an 8-aligned offset (pl.multiple_of)
            base8 = (brow // 8) * 8
            off = pl.multiple_of(woff + base8, 8)
            dlt = brow - base8
            win = [p[pl.ds(off, WMAX + lanes.BP_WINDOW_PAD_ROWS), :]
                   for p in plane_refs]
            wv = lanes.window_fetch_mono_bp(win, row_rel + dlt, rel + dlt,
                                            col, (R, 128))
        else:
            win = stream2_ref[pl.ds(woff + brow, WMAX), :]
            wv = lanes.window_fetch_mono(win, row_rel, rel, col, WMAX,
                                         (R, 128))
        word = lanes.srl(wv, half) & 0xFFFF
        x = jnp.where(m, (x << 16) | word, x)
        return x, base + total, spk

    def body(i, carry):
        xs, bases = list(carry[0]), list(carry[1])
        for g in range(groups):
            sps = [jnp.zeros((R, 128), jnp.int32) for _ in range(ilp)]
            for k in range(4):
                # ilp independent blocks interleave their dependency
                # chains (the reference's 2-way trick, main.cpp:227-291,
                # applied at block level): ~25% on v5e (docs/DESIGN.md)
                for j in range(ilp):
                    xs[j], bases[j], sps[j] = substep(
                        xs[j], bases[j], sps[j], k, j * cap_rows)
            for j in range(ilp):
                out_ref[pl.ds((j * T4 + i * groups + g) * R, R), :] = sps[j]
        return (tuple(xs), tuple(bases))

    x0 = x0_ref[:]
    jax.lax.fori_loop(
        0, T4 // groups, body,
        (tuple(x0[j * R:(j + 1) * R] for j in range(ilp)),
         tuple(jnp.int32(0) for _ in range(ilp))))


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "interpret",
                                             "groups", "ilp", "use_bisect",
                                             "slot_direct", "hoist4", "bp",
                                             "ablate", "i8s"))
def decode_blocks(sym4_rows, fc_rows, x0, stream2_rows, *, T4: int, R: int,
                  sb: int, cap_rows: int, n_blocks: int,
                  interpret: bool = False, groups: int = 1,
                  ilp: int = 1, use_bisect: bool | None = None,
                  slot_direct: bool = False, hoist4: bool = False,
                  bp: bool = True, ablate: str = "", i8s: bool = False):
    """Grid decode of ``n_blocks`` blocks.

    x0: (n_blocks*R, 128); stream2_rows: (n_blocks*cap_rows, 128) with renorm
    words packed 2-per-int32; returns (n_blocks*T4*R, 128) int32 of 4-packed
    symbols.
    """
    if not interpret and R < 2:
        raise ValueError("compiled TPU decode needs n_lanes >= 256 "
                         "(Mosaic lane-gathers reject single-sublane shapes)")
    if T4 % groups:
        raise ValueError(f"T4={T4} not divisible by groups={groups}")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    s4rows = (1 << sb) // 128 if slot_direct else (1 << sb) // 512
    bisect = (not slot_direct) and (
        use_bisect if use_bisect is not None else s4rows > 16)
    tab_specs = [] if bisect else [
        pl.BlockSpec((s4rows, 128), lambda b: (0, 0),
                     memory_space=pltpu.VMEM)]
    tab_args = [] if bisect else [sym4_rows]
    return pl.pallas_call(
        functools.partial(_decode_kernel, T4=T4, R=R, sb=sb, groups=groups,
                          ilp=ilp, use_bisect=use_bisect,
                          slot_direct=slot_direct, hoist4=hoist4, bp=bp,
                          ablate=ablate, i8s=i8s),
        grid=(n_blocks // ilp,),
        out_shape=jax.ShapeDtypeStruct((n_blocks * T4 * R, 128), jnp.int32),
        in_specs=tab_specs + [
            pl.BlockSpec((4, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * cap_rows, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ilp * T4 * R, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((ilp * cap_rows, 128), jnp.int8)] * 4
            if bp else []),
        # large-R (R=256) and large-block shapes exceed the 16M default
        # scoped-vmem limit; v5e has 128M VMEM (host_prep.VMEM_LIMIT)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(*tab_args, fc_rows, x0, stream2_rows)


# ---------------------------------------------------------------------------
# Encode kernel (dense emission phase)
# ---------------------------------------------------------------------------


def _encode_kernel(enc_ref, in_ref, emit_ref, xout_ref, *, T4: int, R: int,
                   sb: int, ilp: int = 1):
    """Walk steps in reverse (rANS twist #1, rans_byte.h:22-23), emitting a
    dense (word | valid<<16) cell per (step, lane)."""
    enc = enc_ref[:]
    L_SHIFT = 32 - sb  # x_max = freq << (16 - sb + 16)  (rans_word_sse41.h:85)

    def substep(x, spk, k, t4, eoff):
        sym = lanes.srl(spk, 8 * k) & 0xFF
        e = lanes.table_lookup(enc, sym, 2, (R, 128))
        freq = lanes.srl(e, 16)
        start = e & 0xFFFF
        thm1 = (freq << L_SHIFT) - 1  # wraps to 0xFFFFFFFF for freq=M
        m = (x ^ lanes.I32_MIN) > (thm1 ^ lanes.I32_MIN)  # x >= freq<<sh
        emit_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = jnp.where(
            m, (x & 0xFFFF) | 0x10000, 0)
        x = jnp.where(m, lanes.srl(x, 16), x)
        q, r = lanes.exact_div(x, freq)
        return (q << sb) + r + start

    def body(i4, xs):
        xs = list(xs)
        t4 = T4 - 1 - i4
        spks = [in_ref[pl.ds((j * T4 + t4) * R, R), :] for j in range(ilp)]
        for k in (3, 2, 1, 0):
            # ilp independent blocks interleave their dependency chains
            # (block-level 2-way interleave; see the decode kernel)
            for j in range(ilp):
                xs[j] = substep(xs[j], spks[j], k, t4, j * 4 * T4 * R)
        return tuple(xs)

    xs = jax.lax.fori_loop(
        0, T4, body,
        tuple(jnp.full((R, 128), 1 << 16, jnp.int32) for _ in range(ilp)))
    for j in range(ilp):
        xout_ref[pl.ds(j * R, R), :] = xs[j]


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "n_blocks",
                                             "interpret", "ilp"))
def encode_blocks(enc_rows, syms_packed, *, T4: int, R: int, sb: int,
                  n_blocks: int, interpret: bool = False, ilp: int = 1):
    """Grid dense encode.  syms_packed: (n_blocks*T4*R, 128).
    Returns (emit (n_blocks*4*T4*R,128) i32, final states (n_blocks*R,128))."""
    if not interpret and R < 2:
        raise ValueError("compiled TPU encode needs n_lanes >= 256 "
                         "(Mosaic lane-gathers reject single-sublane shapes)")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    return pl.pallas_call(
        functools.partial(_encode_kernel, T4=T4, R=R, sb=sb, ilp=ilp),
        grid=(n_blocks // ilp,),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * 4 * T4 * R, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * R, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((2, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ilp * 4 * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        # the dense emit buffer is 4 B/symbol, so big blocks blow the 16M
        # default scoped-vmem limit (host_prep.VMEM_LIMIT / pick_ilp)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(enc_rows, syms_packed)


# ---------------------------------------------------------------------------
# XLA glue: packing, compaction, head assembly
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("T4", "R", "n_blocks"))
def pack_symbols(data_u8, T4: int, R: int, n_blocks: int = 1):
    """uint8 symbols -> (n_blocks*T4*R, 128) int32, 4 steps per word.

    Word at [(b*T4 + t4)*R + r, lane] holds block b's symbols t = 4*t4+k of
    lane (r,lane) in byte k.  Implemented as transpose + bitcast (one
    relayout) rather than 4 shifted adds.
    """
    a = data_u8.reshape(n_blocks, T4, 4, R, 128).transpose(0, 1, 3, 4, 2)
    return jax.lax.bitcast_convert_type(a, jnp.int32).reshape(
        n_blocks * T4 * R, 128)


@functools.partial(jax.jit, static_argnames=("T4", "R", "n_blocks"))
def unpack_symbols(spk, T4: int, R: int, n_blocks: int = 1):
    """Inverse of pack_symbols -> flat uint8."""
    b = jax.lax.bitcast_convert_type(
        spk.reshape(n_blocks, T4, R, 128), jnp.uint8)  # (B,T4,R,128,4)
    return b.transpose(0, 1, 4, 2, 3).reshape(-1)


@functools.partial(jax.jit, static_argnames=("cap_words", "n_blocks"))
def compact_emissions(emit, x_final, cap_words: int, n_blocks: int = 1):
    """Dense (word|valid<<16) cells -> per-block word buffers + counts.

    Returns (words (n_blocks, 2N+cap_words) int32 with head prepended,
    n_words (n_blocks,) int32 incl. head).  The row-major flatten of each
    block's emit region is exactly stream order; head = flushed states
    lane-ascending lo/hi (RansWordEncFlush layout, rans_word_sse41.h:96-106).
    """
    R = x_final.shape[0] // n_blocks
    N = R * 128
    emit = emit.reshape(n_blocks, -1)
    v = lanes.srl(emit, 16)
    w = emit & 0xFFFF
    pos = jnp.cumsum(v, axis=1) - v
    totals = jnp.sum(v, axis=1)
    idx = jnp.where(v == 1, pos, cap_words)
    body = jnp.zeros((n_blocks, cap_words), jnp.int32)
    body = jax.vmap(lambda b, i, ww: b.at[i].set(ww, mode="drop"))(body, idx, w)
    xf = x_final.reshape(n_blocks, N)  # lane-ascending per block
    head = jnp.stack([xf & 0xFFFF, lanes.srl(xf, 16)], axis=2).reshape(
        n_blocks, 2 * N)
    return jnp.concatenate([head, body], axis=1), totals + 2 * N


@functools.partial(jax.jit, static_argnames=("R", "cap_rows", "n_blocks"))
def prep_decode(words_i32, R: int, cap_rows: int, n_blocks: int = 1):
    """(n_blocks, head+body) word values 0..65535 -> (x0, stream pair-rows).

    words rows are per-block buffers of identical capacity; only the first
    n_words[b] entries are meaningful, the rest is ignored padding.  Body
    words are packed two per int32 for the decode kernel's window gathers.
    Accepts uint16 input (r5): the front door transfers the packed u16
    payload and widens ON DEVICE, halving h2d bytes.
    """
    if words_i32.dtype != jnp.int32:
        words_i32 = words_i32.astype(jnp.int32)
    N = R * 128
    head = words_i32[:, :2 * N].reshape(n_blocks, N, 2)
    x0 = (head[:, :, 0] | (head[:, :, 1] << 16)).reshape(n_blocks * R, 128)
    body = words_i32[:, 2 * N:]
    pad = 2 * cap_rows * 128 - body.shape[1]
    if pad < 0:
        body = body[:, :2 * cap_rows * 128]
    else:
        body = jnp.concatenate(
            [body, jnp.zeros((n_blocks, pad), jnp.int32)], axis=1)
    body = body.reshape(n_blocks, cap_rows * 128, 2)
    packed = body[:, :, 0] | (body[:, :, 1] << 16)
    return x0, packed.reshape(n_blocks * cap_rows, 128)




@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "interpret", "ilp"))
def decode_fused(sym4_rows, fc_rows, buf_i32, *, T4: int, R: int, sb: int,
                 cap_rows: int, n_blocks: int, interpret: bool = False,
                 ilp: int = 1):
    """One fused jit: stream prep -> kernel -> symbol unpack, returning a
    device-resident uint8 array (for pipelines that consume decompressed
    data on-chip with no host round-trip)."""
    x0, stream2 = prep_decode(buf_i32, R, cap_rows, n_blocks)
    spk = decode_blocks(sym4_rows, fc_rows, x0, stream2, T4=T4, R=R, sb=sb,
                        cap_rows=cap_rows, n_blocks=n_blocks,
                        interpret=interpret, ilp=ilp)
    return unpack_symbols(spk, T4, R, n_blocks)


# ---------------------------------------------------------------------------
# Host orchestration (whole-buffer encode/decode on one device)
# ---------------------------------------------------------------------------


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pad_block(data, n_lanes: int, freqs):
    """Pad to a multiple of 4*n_lanes with the most frequent symbol.

    Device (jnp) inputs stay ON DEVICE (r5 front door: the data already
    rode the wire for the encode; a np round-trip would move it back) --
    they must arrive pre-padded (api.compress pads device-side)."""
    if not isinstance(data, np.ndarray):
        if data.size % (4 * n_lanes):
            raise ValueError("device-resident encode input must be padded "
                             "to a multiple of 4*n_lanes")
        return data, data.size
    S = data.size
    step = 4 * n_lanes
    S_pad = -(-max(S, 1) // step) * step
    if S_pad == S:
        return data, S
    fill = int(np.argmax(freqs))
    out = np.full(S_pad, fill, np.uint8)
    out[:S] = data
    return out, S


def _split_blocks(cfg: RansConfig, padded_size: int):
    """(n_full_blocks, tail_symbols).  All sizes multiples of 4N."""
    B = cfg.block_symbols
    n_full = padded_size // B
    tail = padded_size - n_full * B
    return n_full, tail


def encode(cfg: RansConfig, data: np.ndarray, freqs, cum_freqs,
           interpret: bool | None = None):
    """Encode on TPU -> (list of per-block u16 word arrays, padded size)."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    padded, _ = pad_block(data if not isinstance(data, np.ndarray)
                          else np.asarray(data, np.uint8), N, freqs)
    enc_rows = jnp.asarray(pack_enc_rows(freqs, cum_freqs, cfg.prob_bits))
    n_full, tail = _split_blocks(cfg, padded.size)
    B = cfg.block_symbols

    # Pipelined dispatch (r5): enqueue every group's transfer + kernels
    # WITHOUT blocking, fetch afterwards -- group N+1's h2d transfer and
    # host prep overlap group N's compute (host_prep.block_groups).
    pend: list = []

    def dispatch(chunk: np.ndarray, n_blocks: int):
        T = chunk.size // n_blocks // N
        T4 = T // 4
        spk = pack_symbols(jnp.asarray(chunk), T4, R, n_blocks)
        # emit 4 B/sym + packed input 1 B/sym per block (host_prep.pick_ilp)
        emit, xf = encode_blocks(enc_rows, spk, T4=T4, R=R, sb=cfg.prob_bits,
                                 n_blocks=n_blocks, interpret=interpret,
                                 ilp=host_prep.pick_ilp(n_blocks, 5 * T * N))
        cap = T * N  # <=1 word per symbol
        pend.append((*compact_emissions(emit, xf, cap, n_blocks), n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(padded[g * B:(g + nb) * B], nb)
    if tail:
        dispatch(padded[n_full * B:], 1)

    out_blocks: list[np.ndarray] = []
    for words, n_words, n_blocks in pend:
        n_np = np.asarray(n_words)  # one fetch per group, not per block
        mx = max(int(n_np.max()), 1)
        # trim to the longest block and narrow to u16 ON DEVICE: the d2h
        # fetch moves ~payload bytes instead of the 4 B/symbol worst-case
        # emission capacity (r5 front-door split)
        words_np = np.asarray(words[:, :mx].astype(jnp.uint16))
        for b in range(n_blocks):
            out_blocks.append(words_np[b, :int(n_np[b])].copy())
    return out_blocks, padded.size


def decode(cfg: RansConfig, word_blocks: list[np.ndarray],
           n_symbols_padded: int, freqs, cum_freqs,
           interpret: bool | None = None) -> np.ndarray:
    """Decode per-block word buffers on TPU -> uint8 symbols (padded len)."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    s4, fc = pack_dec_rows2(freqs, cum_freqs, cfg.prob_bits)
    sym4_rows, fc_rows = jnp.asarray(s4), jnp.asarray(fc)
    n_full, tail = _split_blocks(cfg, n_symbols_padded)
    assert len(word_blocks) == n_full + (1 if tail else 0)
    # one GLOBAL capacity so every full group shares one compiled shape
    cap_rows = decode_cap_rows(max(b.size for b in word_blocks), R)

    # Pipelined dispatch (r5): enqueue every group's transfer + kernels
    # WITHOUT blocking, fetch afterwards (host_prep.block_groups).
    pend: list = []

    def dispatch(blocks: list[np.ndarray], n_symbols_block: int):
        n_blocks = len(blocks)
        T = n_symbols_block // N
        T4 = T // 4
        max_words = max(b.size for b in blocks)
        # u16 on the wire; prep_decode widens on device (half the h2d)
        buf = np.zeros((n_blocks, max_words), np.uint16)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b
        x0, stream2 = prep_decode(jnp.asarray(buf), R, cap_rows, n_blocks)
        # out 1 B/sym + stream window pair-rows per block (host_prep.pick_ilp)
        spk = decode_blocks(sym4_rows, fc_rows, x0, stream2, T4=T4, R=R,
                            sb=cfg.prob_bits, cap_rows=cap_rows,
                            n_blocks=n_blocks, interpret=interpret,
                            ilp=host_prep.pick_ilp(
                                n_blocks, n_symbols_block + cap_rows * 512
                                + cap_rows * 128
                                * lanes.BP_PLANE_BYTES_PER_CELL // 2))
        pend.append(unpack_symbols(spk, T4, R, n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(word_blocks[g:g + nb], cfg.block_symbols)
    if tail:
        dispatch(word_blocks[n_full:],
                 n_symbols_padded - n_full * cfg.block_symbols)
    outs = [np.asarray(p) for p in pend]
    return np.concatenate(outs) if outs else np.zeros(0, np.uint8)
