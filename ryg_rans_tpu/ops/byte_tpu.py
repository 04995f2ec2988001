"""TPU kernels for the BYTE and ALIAS rANS variants (8-bit renorm).

TPU-native re-design of the reference's byte-wise coders:

* W1 rans_byte (rans_byte.h): 32-bit state, L = 1<<23, byte emission.  Its
  looping renorm (rans_byte.h:62-74, 307-318) is bounded by 2 iterations per
  symbol (pre-renorm x < 2^31 and the refill threshold L = 2^23 with 8-bit
  words), so here it becomes exactly two branchless masked rounds with a
  closed-form per-lane byte count ``k = (x < 2^23) + (x < 2^15)``.
* W5 alias rANS (main_alias.cpp:241-267): same state machine, O(1) symbol
  lookup.  The decode side gathers only the O(NSYMS) tables (divider[256],
  packed freq|sym and adjust[512]) -- 10 gather rows total, making ALIAS the
  cheapest per-symbol lookup of all variants on TPU.  The encode side's
  alias_remap[M] bijection (65536 entries at prob_bits 16 -- far too large
  to sweep) is rebuilt as <=512 constant-delta packed segments of the idx
  domain, found by a branchless rank search whose first three levels are
  hoisted loop-invariant selects (build_alias_segments / _encode_kernel).

Renorm bytes travel packed 4-per-int32 through the stream window; the
per-step byte-count prefix sum runs on the MXU (lanes.lane_prefix_sum_rows),
replacing the reference's movemask + shuffle-LUT routing
(rans_word_sse41.h:182-227) which has no lane-count-generic analog.

Stream format matches the oracle/native layout with one substream per block
(docs/FORMAT.md): [4N head bytes: flushed states lane-ascending LE
(rans_byte.h:93-105)] ++ [renorm bytes, (step asc, lane asc, within-lane
most-significant-first)].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RansConfig, Variant
from ..models import alias as alias_mod
from . import host_prep
from . import lanes

L_BITS = 23  # rans_byte.h:50

# ---------------------------------------------------------------------------
# Table packing (host side)
# ---------------------------------------------------------------------------


def _use_bisect(sb: int) -> bool:
    """Binary search on cum beats the packed cum2sym sweep once the slot
    table exceeds 16 rows (M/512 > 16 <=> sb >= 14)."""
    return (1 << sb) // 512 > 16


def pack_byte_dec_tables(freqs, cum_freqs, sb: int):
    """Two-level BYTE decode tables (shared layout, ops/host_prep.py)."""
    return host_prep.pack_sym4_fc(freqs, cum_freqs, sb)


def pack_alias_dec_tables(freqs, cum_freqs, sb: int):
    """Alias decode tables in 6 gather rows (r3; was 10).

    The reference keeps divider[256], slot_freqs/slot_adjust/sym_id[512] as
    four arrays (main_alias.cpp:47-72); here they pack into three:

      div2  (1,128): divider 2-per-int32 (16-bit halves, bucket parity);
      pa    (4,128): per-bucket2 (adj & 0xFF) << 24 | (freq-1) << 16-ish --
                     exactly sym:8 | freq-1:16 | adj_lo:8, 32 bits total
                     (freq-1 keeps the degenerate freq = 2^16 exact; a
                     zero-slot half is never selected, so its clamp is
                     harmless).  PARITY-SPLIT (r4): rows 0-1 hold the even
                     entries (b2 = 2*bucket), rows 2-3 the odd -- the
                     kernel gathers BOTH bucket halves by ``bucket`` in
                     parallel with the divider fetch and selects after the
                     compare, removing the divider->entry dependent-gather
                     stage at the same total gather count;
      adjhi (1,128): slot_adjust >> 8 (8 bits each, 4-per-int32).
    """
    tab = alias_mod.make_alias_tables(freqs, cum_freqs, sb)
    f1 = (np.maximum(tab.slot_freqs, 1) - 1).astype(np.uint32)
    # slot_adjust's TRUE value lies in (-2^16, 2^16) (it can be negative
    # when an alias symbol's earlier slots were assigned in lower buckets;
    # AliasTables stores it wrapped to u32), but slot - adjust always lands
    # in [0, 2^sb) -- that is the decoded idx -- so 16-bit wrapped
    # arithmetic is exact: store adj mod 2^16, decode with
    # (slot - adj) & 0xFFFF.
    adj = tab.slot_adjust.astype(np.uint32) & 0xFFFF
    pa = ((adj & 0xFF) << 24) | (f1 << 8) | tab.sym_id
    pa = np.concatenate([pa[0::2], pa[1::2]])  # even plane, then odd
    ah = adj >> 8
    adjhi = ah[0::4] | (ah[1::4] << 8) | (ah[2::4] << 16) | (ah[3::4] << 24)
    # divider stored bucket-RELATIVE (0..tgt_sum inclusive, <= 9 bits; the
    # absolute value reaches 2^16 when a whole last bucket is one half,
    # which no 16-bit field holds); the kernel compares the in-bucket slot
    tgt = 1 << (sb - 8)
    d = tab.divider.astype(np.int64) - np.arange(256) * tgt
    assert np.all((0 <= d) & (d <= tgt))
    d = d.astype(np.uint32)
    div2 = d[0::2] | (d[1::2] << 16)
    return (div2.view(np.int32).reshape(1, 128),
            pa.view(np.int32).reshape(4, 128),
            adjhi.view(np.int32).reshape(1, 128))


def pack_enc_tables(freqs, cum_freqs) -> np.ndarray:
    """Per-symbol ((freq-1) << 16) | cum rows (shared, ops/host_prep.py)."""
    return host_prep.pack_enc_fc_minus1(freqs, cum_freqs)


def build_alias_segments(freqs, cum_freqs, sb: int) -> np.ndarray:
    """alias_remap as <=512 constant-delta segments, packed for the encoder.

    remap is a bijection built per (bucket, half) in contiguous idx runs
    (main_alias.cpp:207-232), so remap[idx] - idx is piecewise constant over
    <=512 maximal runs.  Each segment packs ((delta mod M) << 16) | start in
    ONE int32: slot = (idx + delta) mod M is exact because slot < M <= 2^16,
    so the bisect's winning entry carries its delta and no second table
    lookup is needed.  The 512 entries are padded by repeating the last
    segment (its delta stays correct for any idx past the last start, so no
    sentinel compare) and interleaved modulo 4 -- entry e lives at
    (e & 3, e >> 2) of the (4,128) table -- so bisect candidates with
    stride >= 4 sit in row 0 (one single-row gather per step), stride 2 in
    row 2, and only the final stride-1 step needs a two-row select.
    """
    _, packed = _alias_segment_arrays(freqs, cum_freqs, sb)
    return packed.reshape(128, 4).T.copy().view(np.int32)


def _alias_segment_arrays(freqs, cum_freqs, sb: int):
    """(starts[:n], flat packed[512]) for build_alias_segments and the
    per-symbol bisect seeds."""
    tab = alias_mod.make_alias_tables(freqs, cum_freqs, sb)
    M = 1 << sb
    d = tab.alias_remap.astype(np.int64) - np.arange(M, dtype=np.int64)
    change = np.nonzero(np.diff(d))[0] + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    deltas = d[starts]
    n = len(starts)
    if n > 512:
        raise AssertionError("alias remap has more than 512 segments")
    st = np.empty(512, np.uint32)
    dm = np.empty(512, np.uint32)
    st[:n] = starts
    st[n:] = starts[-1]
    dm[:n] = (deltas % M).astype(np.uint32)
    dm[n:] = dm[n - 1]
    return starts, (dm << 16) | st


def pack_alias_seed(freqs, cum_freqs, sb: int) -> np.ndarray | None:
    """Per-symbol bisect seeds for the ALIAS encoder (r4 A/B, VERDICT r3
    task 5): the encoder knows the symbol, and symbol s's search keys
    idx in [cum[s], cum[s+1]) land in a narrow band of segments, so a
    256-entry seed bounds the bisect to 5 levels (16..1) with NO hoisted
    select cascade.  Returns (4,128) int32 -- rows 0-1: lo4[sym] = (last
    segment with start <= cum[s]) & ~3 (rounded down so stride >= 4
    candidates keep the mod-4 row-0 property of build_alias_segments),
    rows 2-3: the packed entry at lo4 (the running-best seed; its start
    <= cum[s] <= idx keeps the search invariant).  None when some
    symbol's band exceeds the depth-5 reach of 31 entries (callers fall
    back to the hoisted-constant path)."""
    starts, packed = _alias_segment_arrays(freqs, cum_freqs, sb)
    cum = np.asarray(cum_freqs, np.int64)
    lo0 = np.searchsorted(starts, cum[:256], "right") - 1
    hi0 = np.searchsorted(starts, np.maximum(cum[1:257] - 1, 0),
                          "right") - 1
    lo4 = (lo0 & ~3).astype(np.int64)
    if np.any(hi0 - lo4 > 31):
        return None
    rows = np.empty(512, np.uint32)
    rows[:256] = lo4.astype(np.uint32)
    rows[256:] = packed[lo4]
    return rows.reshape(4, 128).view(np.int32)


def _supports(cfg: RansConfig):
    if cfg.variant not in (Variant.BYTE, Variant.ALIAS):
        raise ValueError("byte_tpu handles the BYTE and ALIAS variants")
    if cfg.variant == Variant.BYTE and not 9 <= cfg.prob_bits <= 16:
        raise ValueError("TPU byte kernel needs 9 <= prob_bits <= 16")
    if cfg.variant == Variant.ALIAS and not 9 <= cfg.prob_bits <= 16:
        raise ValueError("TPU alias kernel needs 9 <= prob_bits <= 16")
    if cfg.n_lanes % 128 or cfg.n_lanes < 128:
        raise ValueError("TPU byte kernel needs n_lanes a multiple of 128")
    if cfg.lanes_per_stream != cfg.n_lanes:
        raise ValueError("TPU byte kernel uses one substream per block")
    if cfg.block_symbols % (4 * cfg.n_lanes):
        raise ValueError("TPU kernels need block_symbols to be a multiple "
                         "of 4*n_lanes (symbols travel 4-packed per int32)")


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------


def wmax_rows(R: int) -> int:
    """Worst-case window span in 4-byte rows (2 bytes/lane/step = R/2 rows,
    +offset/idx1 spill), rounded to 8 sublanes for Mosaic slices."""
    return -(-((R + 1) // 2 + 2) // 8) * 8


def decode_cap_rows(max_bytes: int, R: int) -> int:
    """Stream buffer capacity (4-byte rows) for a block of ``max_bytes``
    total payload bytes: body + the kernel's window span of overread pad."""
    N = R * 128
    body_rows = max(0, -(-(max_bytes - 4 * N) // 512))
    return -(-(body_rows + wmax_rows(R) + 1) // 8) * 8 \
        + lanes.BP_WINDOW_PAD_ROWS  # bp fetch loads an 8-aligned window


def _decode_kernel(*refs, T4: int, R: int, sb: int, alias: bool,
                   ilp: int = 1, hoist4: bool = False, bp: bool = True,
                   i8s: bool = False):
    """Decode one block: 4*T4 steps over (R,128) lanes, 8-bit renorm."""
    if bp:  # byte-plane window scratches are the LAST 4 refs (scratch)
        refs, plane_refs = refs[:-4], refs[-4:]
    if alias:
        div_ref, pa_ref, adj_ref, x0_ref, stream4_ref, out_ref = refs
        div = div_ref[:]
        pa = pa_ref[:]
        adj = adj_ref[:]
    elif _use_bisect(sb):
        fc_ref, x0_ref, stream4_ref, out_ref = refs
        fc = fc_ref[:]
    else:
        sym4_ref, fc_ref, x0_ref, stream4_ref, out_ref = refs
        sym4 = sym4_ref[:]
        fc = fc_ref[:]
        s4rows = (1 << sb) // 512
    if bp:  # hoist the stream's byte-plane split out of the symbol loop
        lanes.fill_byte_planes(plane_refs, stream4_ref[:])
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(jnp.int8 if i8s else jnp.float32)
    M1 = (1 << sb) - 1
    WMAX = wmax_rows(R)
    cap_rows = stream4_ref.shape[0] // ilp
    # loop-invariant first-level bisect keys (lanes.bisect_consts);
    # fused=True also at sb == 16: the track2 search needs the entry-255
    # reject-tracker seed
    bconsts = lanes.bisect_consts(fc[2:4], (R, 128), fused=True,
                                  levels=4 if hoist4 else 3) \
        if (not alias and _use_bisect(sb)) else None

    def substep(x, base, spk, k, woff):
        slot = x & M1
        if alias:
            # O(1) alias lookup (RansDecGetAlias, main_alias.cpp:252-267)
            # in 6 gather rows: paired dividers, fused sym|freq-1|adj_lo
            # entry, 4-packed adj_hi plane (pack_alias_dec_tables).
            # ALL FOUR fetches index by bucket (or bucket>>1), so the
            # divider word, adj_hi word and BOTH bucket-half entries
            # (parity-split pa planes, r4) gather in parallel; the
            # divider compare only picks between the two entries --
            # no gather depends on another gather.
            bucket = lanes.srl(slot, sb - 8)
            bh = lanes.srl(bucket, 1)
            dw = lanes.row_gather(div, bh, (R, 128))
            aw = lanes.row_gather(adj, bh, (R, 128))
            e0 = lanes.table_lookup(pa[0:2], bucket, 2, (R, 128))
            e1 = lanes.table_lookup(pa[2:4], bucket, 2, (R, 128))
            dv = lanes.srl(dw, (bucket & 1) << 4) & 0xFFFF
            # dividers are bucket-relative (pack_alias_dec_tables):
            # compare the in-bucket slot
            sin = slot & ((1 << (sb - 8)) - 1)
            half = (sin < dv).astype(jnp.int32)  # b2 = 2*bucket + half
            e = jnp.where(half == 1, e1, e0)
            # (b2 & 3) << 3 with b2 = 2*bucket + half
            sh = ((bucket & 1) << 4) | (half << 3)
            av = ((lanes.srl(aw, sh) & 0xFF) << 8) \
                | lanes.srl(e, 24)
            sym = e & 0xFF
            freq = (lanes.srl(e, 8) & 0xFFFF) + 1
            # 16-bit wrapped subtract: adj may be a wrapped negative, but
            # the true slot - adj is in [0, 2^sb) (pack_alias_dec_tables)
            x = freq * lanes.srl(x, sb) + ((slot - av) & 0xFFFF)
        elif _use_bisect(sb):
            # binary search on cum beats the 4-packed cum2sym sweep
            # (M/512 = 32+ rows) at prob_bits >= 14; at sb <= 15 the
            # FUSED keys carry (freq, cum) so no fc gather is needed
            if sb <= 15:
                sym, freq, cumv = lanes.cum2sym_bisect_fused(
                    fc[2:4], slot, sb, (R, 128), consts=bconsts)
            else:
                # sb == 16: plain cum[s+1] keys; tracking BOTH search
                # neighbors gives freq = cum[sym+1] - cum[sym] and cum
                # with no fc gather (r5, lanes.cum2sym_bisect_track2)
                sym, acc, rej = lanes.cum2sym_bisect_track2(
                    fc[2:4], slot, (R, 128), consts=bconsts, acc_init=0)
                freq = rej - acc
                cumv = acc
            x = freq * lanes.srl(x, sb) + slot - cumv
        else:
            # two-level cum2sym lookup + advance (rans_byte.h:125-149)
            s4 = lanes.table_lookup(sym4, lanes.srl(slot, 2), s4rows,
                                    (R, 128))
            sym = lanes.srl(s4, (slot & 3) << 3) & 0xFF
            e = lanes.table_lookup(fc, sym, 2, (R, 128))
            freq = lanes.srl(e, 16) + 1  # fc packs freq-1 (host_prep)
            x = freq * lanes.srl(x, sb) + slot - (e & 0xFFFF)
        spk = spk | (sym << (8 * k))
        # closed-form renorm count: k = (x < 2^23) + (x < 2^15)
        # (bounded form of the loop at rans_byte.h:307-318)
        m1 = lanes.ult(x, 1 << L_BITS)
        m2 = lanes.ult(x, 1 << (L_BITS - 8))
        if i8s:  # int8 prefix scan (exact: counts <= 2 per lane);
            # Mosaic rejects int8 vector adds -- count in i32, cast once
            kq = (m1.astype(jnp.int32)
                  + m2.astype(jnp.int32)).astype(jnp.int8)
            incl, total, rowstart = lanes.lane_prefix_sum_rows_i8(kq, tri, R)
        else:
            kf = m1.astype(jnp.float32) + m2.astype(jnp.float32)
            incl, total, rowstart = lanes.lane_prefix_sum_rows(kf, tri, R)
        excl = incl - m1.astype(jnp.int32) - m2.astype(jnp.int32)
        idx0 = base + excl        # first (most-significant) refill byte
        idx1 = idx0 + 1
        # monotone two-candidate window fetch (lanes.window_fetch_mono):
        # a row of 128 lanes consumes <=256 bytes < 512 bytes/window-row,
        # so both byte indices stay within {row_rel, row_rel+1}
        brow = jax.lax.shift_right_logical(base, 9)
        row_rel = jax.lax.shift_right_logical(base + rowstart, 9) - brow
        rel0 = jax.lax.shift_right_logical(idx0, 9) - brow
        rel1 = jax.lax.shift_right_logical(idx1, 9) - brow
        col0 = jax.lax.shift_right_logical(idx0, 2) & 127
        col1 = jax.lax.shift_right_logical(idx1, 2) & 127
        if bp:
            # int8 dynamic loads need an 8-aligned offset (pl.multiple_of)
            base8 = (brow // 8) * 8
            off = pl.multiple_of(woff + base8, 8)
            dlt = brow - base8
            win = [p[pl.ds(off, WMAX + lanes.BP_WINDOW_PAD_ROWS), :]
                   for p in plane_refs]
            v0, v1 = lanes.window_fetch_mono2_bp(
                win, row_rel + dlt, (rel0 + dlt, rel1 + dlt),
                (col0, col1), (R, 128))
        else:
            win = stream4_ref[pl.ds(woff + brow, WMAX), :]
            v0, v1 = lanes.window_fetch_mono2(win, row_rel, (rel0, rel1),
                                              (col0, col1), WMAX, (R, 128))
        b0 = lanes.srl(v0, (idx0 & 3) << 3) & 0xFF
        b1 = lanes.srl(v1, (idx1 & 3) << 3) & 0xFF
        x = jnp.where(m2, (x << 16) | (b0 << 8) | b1,
                      jnp.where(m1, (x << 8) | b0, x))
        return x, base + total, spk

    def body(i4, carry):
        xs, bases = list(carry[0]), list(carry[1])
        sps = [jnp.zeros((R, 128), jnp.int32) for _ in range(ilp)]
        for k in range(4):
            # ilp independent blocks interleave their dependency chains
            # (block-level 2-way interleave; see word_tpu)
            for j in range(ilp):
                xs[j], bases[j], sps[j] = substep(
                    xs[j], bases[j], sps[j], k, j * cap_rows)
        for j in range(ilp):
            out_ref[pl.ds((j * T4 + i4) * R, R), :] = sps[j]
        return (tuple(xs), tuple(bases))

    x0 = x0_ref[:]
    jax.lax.fori_loop(
        0, T4, body,
        (tuple(x0[j * R:(j + 1) * R] for j in range(ilp)),
         tuple(jnp.int32(0) for _ in range(ilp))))


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "alias", "interpret",
                                             "ilp", "hoist4", "bp", "i8s"))
def decode_blocks(tables, x0, stream4_rows, *, T4: int, R: int, sb: int,
                  cap_rows: int, n_blocks: int, alias: bool,
                  interpret: bool = False, ilp: int = 1,
                  hoist4: bool = False, bp: bool = True, i8s: bool = False):
    """Grid decode of n_blocks blocks.

    tables: (sym4, fc) for BYTE or (div, pa, adj) for ALIAS; x0
    (n_blocks*R, 128); stream4_rows (n_blocks*cap_rows, 128) renorm bytes
    packed 4/int32.  Returns (n_blocks*T4*R, 128) int32 4-packed symbols.
    """
    if not interpret and R < 2:
        raise ValueError("compiled TPU decode needs n_lanes >= 256")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    tab_specs = [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        functools.partial(_decode_kernel, T4=T4, R=R, sb=sb, alias=alias,
                          ilp=ilp, hoist4=hoist4, bp=bp, i8s=i8s),
        grid=(n_blocks // ilp,),
        out_shape=jax.ShapeDtypeStruct((n_blocks * T4 * R, 128), jnp.int32),
        in_specs=tab_specs + [
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
        # big-block shapes exceed the 16M default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(*tables, x0, stream4_rows)


# ---------------------------------------------------------------------------
# Encode kernel
# ---------------------------------------------------------------------------

def _encode_kernel(*refs, T4: int, R: int, sb: int, alias: bool,
                   ilp: int = 1, hoist_extra: int = 1,
                   seed_bisect: bool = False):
    """Reverse-walk encode emitting one (k<<16 | fwd0<<8 | fwd1) cell per
    (step, lane); <=2 renorm bytes per symbol (rans_byte.h:62-74)."""
    if alias:
        if seed_bisect:
            fc_ref, sp_ref, seed_ref, in_ref, emit_ref, xout_ref = refs
        else:
            fc_ref, sp_ref, in_ref, emit_ref, xout_ref = refs
        sp = sp_ref[:]
        # mod-4 interleaved segment rows (build_alias_segments): pre-
        # broadcast each so bisect steps are one take_along_axis each
        sp_row = [jnp.broadcast_to(sp[r:r + 1, :], (R, 128))
                  for r in range(4)]

        if seed_bisect:
            # per-symbol bisect seeds (pack_alias_seed): the whole
            # hoisted-constant cascade below is subsumed by two
            # independent-of-x seed gathers per symbol
            seed = seed_ref[:]
            seed_lo, seed_e = seed[0:2], seed[2:4]
        else:
            # loop-invariant first-level search keys: entry 0 (the ebest
            # init) and the constant candidate sets of strides 256
            # ({256}), 128 ({128,384}) and 64 ({64,192,320,448}) -- all
            # row 0 of the mod-4 interleave.  Hoisted out of the symbol
            # loop; those three levels then resolve with selects instead
            # of gathers.
            def _g0(entry):
                col = jnp.full((R, 128), entry >> 2, jnp.int32)
                return jnp.take_along_axis(sp_row[0], col, axis=1)

            sE0 = _g0(0)
            s256 = _g0(256)
            s128, s384 = _g0(128), _g0(384)
            s64, s192, s320, s448 = _g0(64), _g0(192), _g0(320), _g0(448)
            # level-1 compare key with the & 0xFFFF pre-applied (the
            # deeper levels' keys come out of selects, where an AND costs
            # the same)
            s256k = s256 & 0xFFFF
            # hoist_extra >= 1: the stride-32 candidates are 8 more
            # constants; a 7-select tree in the loop replaces that
            # level's gather (r3 A/B; 1 is the measured default)
            if hoist_extra >= 1:
                s32c = [_g0(32 + 64 * i) for i in range(8)]
            # hoist_extra >= 2: one level further (16 constants,
            # 15-select tree); A/B hook -- vreg pressure vs one more
            # dependent gather
            if hoist_extra >= 2:
                s16c = [_g0(16 + 32 * i) for i in range(16)]
    else:
        fc_ref, in_ref, emit_ref, xout_ref = refs
    fc = fc_ref[:]
    SH = 31 - sb  # x_max = freq << (l_bits - sb + 8) = freq << (31 - sb)

    def substep(x, spk, k, t4, eoff):
        sym = lanes.srl(spk, 8 * k) & 0xFF
        e = lanes.table_lookup(fc, sym, 2, (R, 128))
        freq = lanes.srl(e, 16) + 1
        start = e & 0xFFFF
        thm1 = (freq << SH) - 1  # wraps for freq = M; ugt handles it
        m1 = lanes.ugt(x, thm1)
        ba = x & 0xFF
        x = jnp.where(m1, lanes.srl(x, 8), x)
        m2 = lanes.ugt(x, thm1)
        bb = x & 0xFF
        x = jnp.where(m2, lanes.srl(x, 8), x)
        kc = m1.astype(jnp.int32) + m2.astype(jnp.int32)
        fwd0 = jnp.where(m2, bb, ba)       # most-significant byte first
        fwd1 = jnp.where(m2, ba, 0)
        emit_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = \
            (kc << 16) | (fwd0 << 8) | fwd1
        q, r = lanes.exact_div(x, freq)
        if alias:
            # x = (x/f)<<sb + alias_remap[(x%f) + cum] via segment
            # binary search (main_alias.cpp:241-250).  Candidates with
            # stride >= 4 are congruent 0 mod 4 -> interleaved row 0;
            # stride 2 -> row 2; stride 1 -> rows {1,3}.  The winning
            # entry carries (delta mod M) in its high half, so the
            # search result IS the remap -- 11 single-row gathers total.
            # (A 4-ary variant with 3 parallel probes/level measured
            # SLOWER, 12.5 vs ~16 GB/s: the VPU is gather-throughput-
            # bound here, not depth-bound.)
            idx = r + start
            if seed_bisect:
                # seeded depth-5 search over [lo4[sym], lo4[sym]+31]:
                # both seed gathers depend only on sym (off the critical
                # x chain); strides 16/8/4 clamp to 508 to stay in-range
                # AND congruent 0 mod 4 (row 0 of the interleave)
                lo = lanes.table_lookup(seed_lo, sym, 2, (R, 128))
                ebest = lanes.table_lookup(seed_e, sym, 2, (R, 128))
                for step in (16, 8, 4):
                    cand = jnp.minimum(lo + step, 508)
                    ev = jnp.take_along_axis(sp_row[0], lanes.srl(cand, 2),
                                             axis=1)
                    acc = (ev & 0xFFFF) <= idx
                    lo = jnp.where(acc, cand, lo)
                    ebest = jnp.where(acc, ev, ebest)
                cand = lo + 2                       # lo = 0 mod 4 -> row 2
                ev = jnp.take_along_axis(sp_row[2], lanes.srl(cand, 2),
                                         axis=1)
                acc = (ev & 0xFFFF) <= idx
                lo = jnp.where(acc, cand, lo)
                ebest = jnp.where(acc, ev, ebest)
                cand = lo + 1                       # rows 1/3 by parity
                col = lanes.srl(cand, 2)
                v1 = jnp.take_along_axis(sp_row[1], col, axis=1)
                v3 = jnp.take_along_axis(sp_row[3], col, axis=1)
                ev = jnp.where((cand & 2) != 0, v3, v1)
                acc = (ev & 0xFFFF) <= idx
                ebest = jnp.where(acc, ev, ebest)
                slot = (idx + lanes.srl(ebest, 16)) & ((1 << sb) - 1)
                return (q << sb) | slot
            # hoisted levels 256/128/64: selects over the precomputed
            # constant keys (start fields pre-ANDed above), no gathers
            a1 = s256k <= idx
            lo = jnp.where(a1, 256, 0)
            ebest = jnp.where(a1, s256, sE0)
            ev = jnp.where(a1, s384, s128)          # entry lo + 128
            a2 = (ev & 0xFFFF) <= idx
            lo = lo + jnp.where(a2, 128, 0)
            ebest = jnp.where(a2, ev, ebest)
            ev = jnp.where(a1, jnp.where(a2, s448, s320),
                           jnp.where(a2, s192, s64))  # entry lo + 64
            a3 = (ev & 0xFFFF) <= idx
            lo = lo + jnp.where(a3, 64, 0)
            ebest = jnp.where(a3, ev, ebest)
            if hoist_extra >= 1:
                # entry lo + 32 from the 8 hoisted constants: a select
                # tree (7 wheres) instead of a dependent lane-gather
                t = [jnp.where(a3, s32c[2 * i + 1], s32c[2 * i])
                     for i in range(4)]
                u0 = jnp.where(a2, t[1], t[0])
                u1 = jnp.where(a2, t[3], t[2])
                ev = jnp.where(a1, u1, u0)
                a4 = (ev & 0xFFFF) <= idx
                lo = lo + jnp.where(a4, 32, 0)
                ebest = jnp.where(a4, ev, ebest)
            if hoist_extra >= 2:
                t = [jnp.where(a4, s16c[2 * i + 1], s16c[2 * i])
                     for i in range(8)]
                t = [jnp.where(a3, t[2 * i + 1], t[2 * i]) for i in range(4)]
                u0 = jnp.where(a2, t[1], t[0])
                u1 = jnp.where(a2, t[3], t[2])
                ev = jnp.where(a1, u1, u0)
                a5 = (ev & 0xFFFF) <= idx
                lo = lo + jnp.where(a5, 16, 0)
                ebest = jnp.where(a5, ev, ebest)
            steps = {0: (32, 16, 8, 4, 2), 1: (16, 8, 4, 2),
                     2: (8, 4, 2)}[hoist_extra]
            for step in steps:
                row = sp_row[0] if step >= 4 else sp_row[2]
                cand = lo + step
                ev = jnp.take_along_axis(row, lanes.srl(cand, 2), axis=1)
                acc = (ev & 0xFFFF) <= idx
                lo = jnp.where(acc, cand, lo)
                ebest = jnp.where(acc, ev, ebest)
            cand = lo + 1
            col = lanes.srl(cand, 2)
            v1 = jnp.take_along_axis(sp_row[1], col, axis=1)
            v3 = jnp.take_along_axis(sp_row[3], col, axis=1)
            ev = jnp.where((cand & 2) != 0, v3, v1)
            acc = (ev & 0xFFFF) <= idx
            ebest = jnp.where(acc, ev, ebest)
            slot = (idx + lanes.srl(ebest, 16)) & ((1 << sb) - 1)
            x = (q << sb) | slot
        else:
            x = (q << sb) + r + start
        return x

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
        tuple(jnp.full((R, 128), 1 << L_BITS, jnp.int32)
              for _ in range(ilp)))
    for j in range(ilp):
        xout_ref[pl.ds(j * R, R), :] = xs[j]


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "n_blocks",
                                             "alias", "interpret", "ilp",
                                             "hoist_extra", "seed_bisect"))
def encode_blocks(tables, syms_packed, *, T4: int, R: int, sb: int,
                  n_blocks: int, alias: bool, interpret: bool = False,
                  ilp: int = 1, hoist_extra: int = 1,
                  seed_bisect: bool = False):
    """Grid dense encode.  tables: (fc,), (fc, seg_packed) or
    (fc, seg_packed, seed) with seed_bisect=True (pack_alias_seed A/B).
    Returns (emit cells (n_blocks*4*T4*R,128) i32, states (n_blocks*R,128))."""
    if not interpret and R < 2:
        raise ValueError("compiled TPU encode needs n_lanes >= 256")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    if hoist_extra not in (0, 1, 2):
        raise ValueError(f"hoist_extra={hoist_extra} not in 0..2")
    if seed_bisect and (not alias or len(tables) != 3):
        raise ValueError("seed_bisect needs alias tables (fc, seg, seed)")
    tab_specs = [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in tables
    ]
    return pl.pallas_call(
        functools.partial(_encode_kernel, T4=T4, R=R, sb=sb, alias=alias,
                          ilp=ilp, hoist_extra=hoist_extra,
                          seed_bisect=seed_bisect),
        grid=(n_blocks // ilp,),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * 4 * T4 * R, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * R, 128), jnp.int32),
        ),
        in_specs=tab_specs + [
            pl.BlockSpec((ilp * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ilp * 4 * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        # the dense emit buffer is 4 B/symbol: big blocks blow the 16M
        # default scoped-vmem limit (host_prep.VMEM_LIMIT / pick_ilp)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(*tables, syms_packed)


# ---------------------------------------------------------------------------
# XLA glue: compaction and head assembly (byte granularity)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cap_bytes", "n_blocks"))
def compact_emissions(emit, x_final, cap_bytes: int, n_blocks: int = 1):
    """Dense byte cells -> per-block byte buffers (as int32 values) + counts.

    Head = flushed 32-bit states as 4 LE bytes lane-ascending
    (RansEncFlush, rans_byte.h:93-105).
    """
    R = x_final.shape[0] // n_blocks
    N = R * 128
    emit = emit.reshape(n_blocks, -1)
    k = lanes.srl(emit, 16)
    b0 = lanes.srl(emit, 8) & 0xFF
    b1 = emit & 0xFF
    pos = jnp.cumsum(k, axis=1) - k
    totals = jnp.sum(k, axis=1)
    idx0 = jnp.where(k >= 1, pos, cap_bytes)
    idx1 = jnp.where(k == 2, pos + 1, cap_bytes)
    body = jnp.zeros((n_blocks, cap_bytes), jnp.int32)
    body = jax.vmap(
        lambda b, i0, v0, i1, v1: b.at[i0].set(v0, mode="drop")
        .at[i1].set(v1, mode="drop"))(body, idx0, b0, idx1, b1)
    xf = x_final.reshape(n_blocks, N)
    head = jnp.stack([xf & 0xFF, lanes.srl(xf, 8) & 0xFF,
                      lanes.srl(xf, 16) & 0xFF, lanes.srl(xf, 24) & 0xFF],
                     axis=2).reshape(n_blocks, 4 * N)
    return jnp.concatenate([head, body], axis=1), totals + 4 * N


@functools.partial(jax.jit, static_argnames=("R", "cap_rows", "n_blocks"))
def prep_decode(bytes_i32, R: int, cap_rows: int, n_blocks: int = 1):
    """(n_blocks, head+body) byte values -> (x0, stream rows 4 bytes/int32).
    Accepts uint8 input (r5): the front door transfers raw payload bytes
    and widens ON DEVICE (4x fewer h2d bytes)."""
    if bytes_i32.dtype != jnp.int32:
        bytes_i32 = bytes_i32.astype(jnp.int32)
    N = R * 128
    head = bytes_i32[:, :4 * N].reshape(n_blocks, N, 4)
    x0 = (head[:, :, 0] | (head[:, :, 1] << 8) | (head[:, :, 2] << 16)
          | (head[:, :, 3] << 24)).reshape(n_blocks * R, 128)
    body = bytes_i32[:, 4 * N:]
    pad = 4 * cap_rows * 128 - body.shape[1]
    if pad < 0:
        body = body[:, :4 * cap_rows * 128]
    else:
        body = jnp.concatenate(
            [body, jnp.zeros((n_blocks, pad), jnp.int32)], axis=1)
    body = body.reshape(n_blocks, cap_rows * 128, 4)
    packed = (body[:, :, 0] | (body[:, :, 1] << 8) | (body[:, :, 2] << 16)
              | (body[:, :, 3] << 24))
    return x0, packed.reshape(n_blocks * cap_rows, 128)




@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "alias", "interpret",
                                             "ilp"))
def decode_fused(tables, buf_i32, *, T4: int, R: int, sb: int, cap_rows: int,
                 n_blocks: int, alias: bool, interpret: bool = False,
                 ilp: int = 1):
    """One fused jit: stream prep -> kernel -> symbol unpack (device out)."""
    from . import word_tpu
    x0, stream4 = prep_decode(buf_i32, R, cap_rows, n_blocks)
    spk = decode_blocks(tables, x0, stream4, T4=T4, R=R, sb=sb,
                        cap_rows=cap_rows, n_blocks=n_blocks, alias=alias,
                        interpret=interpret, ilp=ilp)
    return word_tpu.unpack_symbols(spk, T4, R, n_blocks)


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


_default_interpret = host_prep.default_interpret
_split_blocks = host_prep.split_blocks


def dec_tables(cfg: RansConfig, freqs, cum_freqs):
    if cfg.variant == Variant.ALIAS:
        return tuple(jnp.asarray(t) for t in pack_alias_dec_tables(
            freqs, cum_freqs, cfg.prob_bits))
    sym4, fc = pack_byte_dec_tables(freqs, cum_freqs, cfg.prob_bits)
    if _use_bisect(cfg.prob_bits):
        return (jnp.asarray(fc),)
    return (jnp.asarray(sym4), jnp.asarray(fc))


def enc_tables(cfg: RansConfig, freqs, cum_freqs, seed_bisect: bool = False):
    fc = jnp.asarray(pack_enc_tables(freqs, cum_freqs))
    if cfg.variant == Variant.ALIAS:
        sp = build_alias_segments(freqs, cum_freqs, cfg.prob_bits)
        if seed_bisect:
            seed = pack_alias_seed(freqs, cum_freqs, cfg.prob_bits)
            if seed is not None:
                return (fc, jnp.asarray(sp), jnp.asarray(seed))
        return (fc, jnp.asarray(sp))
    return (fc,)


def encode(cfg: RansConfig, data: np.ndarray, freqs, cum_freqs,
           interpret: bool | None = None, seed_bisect: bool = False):
    """Encode on TPU -> (list of per-block uint8 arrays, padded size)."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    from . import word_tpu  # shared pad/pack helpers
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    alias = cfg.variant == Variant.ALIAS
    padded, _ = word_tpu.pad_block(data if not isinstance(data, np.ndarray)
                          else np.asarray(data, np.uint8), N, freqs)
    tables = enc_tables(cfg, freqs, cum_freqs, seed_bisect=seed_bisect)
    seeded = len(tables) == 3  # pack_alias_seed may decline (wide bands)
    n_full, tail = _split_blocks(cfg, padded.size)
    B = cfg.block_symbols

    # Pipelined dispatch (r5): enqueue every group's transfer + kernels
    # WITHOUT blocking, fetch afterwards (host_prep.block_groups).
    pend: list = []

    def dispatch(chunk: np.ndarray, n_blocks: int):
        T = chunk.size // n_blocks // N
        T4 = T // 4
        spk = word_tpu.pack_symbols(jnp.asarray(chunk), T4, R, n_blocks)
        emit, xf = encode_blocks(tables, spk, T4=T4, R=R, sb=cfg.prob_bits,
                                 n_blocks=n_blocks, alias=alias,
                                 interpret=interpret, seed_bisect=seeded,
                                 ilp=host_prep.pick_ilp(n_blocks, 5 * T * N))
        cap = 2 * T * N  # <=2 bytes per symbol
        pend.append((*compact_emissions(emit, xf, cap, n_blocks), n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(padded[g * B:(g + nb) * B], nb)
    if tail:
        dispatch(padded[n_full * B:], 1)

    out_blocks: list[np.ndarray] = []
    for buf, n_bytes, n_blocks in pend:
        n_np = np.asarray(n_bytes)  # one fetch per group, not per block
        mx = max(int(n_np.max()), 1)
        # trim + narrow to u8 ON DEVICE before the d2h fetch (r5)
        buf_np = np.asarray(buf[:, :mx].astype(jnp.uint8))
        for b in range(n_blocks):
            out_blocks.append(buf_np[b, :int(n_np[b])].copy())
    return out_blocks, padded.size


def decode(cfg: RansConfig, byte_blocks: list[np.ndarray],
           n_symbols_padded: int, freqs, cum_freqs,
           interpret: bool | None = None) -> np.ndarray:
    """Decode per-block byte buffers on TPU -> uint8 symbols (padded len)."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    from . import word_tpu
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    alias = cfg.variant == Variant.ALIAS
    tables = dec_tables(cfg, freqs, cum_freqs)
    n_full, tail = _split_blocks(cfg, n_symbols_padded)
    assert len(byte_blocks) == n_full + (1 if tail else 0)
    # one GLOBAL capacity so every full group shares one compiled shape
    cap_rows = decode_cap_rows(max(b.size for b in byte_blocks), R)

    # Pipelined dispatch (r5): enqueue every group's transfer + kernels
    # WITHOUT blocking, fetch afterwards (host_prep.block_groups).
    pend: list = []

    def dispatch(blocks: list[np.ndarray], n_symbols_block: int):
        n_blocks = len(blocks)
        T = n_symbols_block // N
        T4 = T // 4
        max_bytes = max(b.size for b in blocks)
        # u8 on the wire; prep_decode widens on device (4x fewer h2d)
        buf = np.zeros((n_blocks, max_bytes), np.uint8)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b
        x0, stream4 = prep_decode(jnp.asarray(buf), R, cap_rows, n_blocks)
        # BYTE's third independent block chain measured +4% in one
        # same-process A/B (12.51 vs 12.07) and never worse, so prefer
        # it; ALIAS re-measured with the r5 byte-plane fetch: ilp=3 wins
        # (17.27 vs 16.27 GB/s, AB_BP_ALL_r05) -- both now prefer 3
        spk = decode_blocks(tables, x0, stream4, T4=T4, R=R,
                            sb=cfg.prob_bits, cap_rows=cap_rows,
                            n_blocks=n_blocks, alias=alias,
                            interpret=interpret,
                            ilp=host_prep.pick_ilp(
                                n_blocks, n_symbols_block + cap_rows * 512
                                + cap_rows * 128
                                * lanes.BP_PLANE_BYTES_PER_CELL // 2,
                                prefer=(3, 2)))
        pend.append(word_tpu.unpack_symbols(spk, T4, R, n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(byte_blocks[g:g + nb], cfg.block_symbols)
    if tail:
        dispatch(byte_blocks[n_full:],
                 n_symbols_padded - n_full * cfg.block_symbols)
    outs = [np.asarray(p) for p in pend]
    return np.concatenate(outs) if outs else np.zeros(0, np.uint8)
