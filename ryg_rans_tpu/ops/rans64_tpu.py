"""TPU kernels for the RANS64 variant (64-bit state, 32-bit-word renorm).

TPU-native re-design of the reference's rans64 coder (rans64.h): the 63-bit
state (rans64.h:55-59) has no VPU dtype, so each lane carries it as an
(hi, lo) int32 pair and the three 64-bit operations in the hot loop are
decomposed into exact 16-bit-limb arithmetic:

* decode advance ``x = freq * (x >> sb) + slot - cum`` (rans64.h:126-142):
  freq <= 2^15 fits one limb, so the 16x64 product is three 16x16->32
  multiplies plus carries -- every intermediate provably < 2^31;
* encode division ``q = x / freq`` (rans64.h:77-93, slow path): schoolbook
  long division over four 16-bit limbs, each step one fp32-reciprocal
  exact_div (ops/lanes.exact_div) -- the VPU-native stand-in for the
  reference's 128-bit Alverson reciprocals (rans64.h:167-247);
* renorm moves whole 32-bit words and never iterates (rans64.h:81-89,
  134-139): ``x < 2^31  <=>  hi == 0 and lo's sign bit clear``, a single
  masked shift of the pair.

Renorm words travel as raw int32 lanes through the stream window (no
sub-word packing needed at 32-bit granularity).  Stream format matches the
oracle/native layout with one substream per block (docs/FORMAT.md): head =
flushed states as 2 LE u32 words per lane, lane-ascending
(Rans64EncFlush, rans64.h:96-103), then renorm words (step asc, lane asc).

The TPU path covers the reference's FULL precision range, prob_bits <= 31
(rans64.h:169, the variant's defining near-entropy feature):

* prob_bits <= 16: one-limb frequencies; encode divides with the 64/16
  schoolbook above;
* prob_bits 17..31: two-limb frequencies -- decode advance becomes a
  32x64 limb product (lanes.mul_u32_u64) over full-width tables
  (host_prep.pack_wide_fc), and encode uses the reference's own
  division-free 64-bit Alverson reciprocal (Rans64EncSymbolInit math,
  rans64.h:167-247; q = mulhi64(x, rcp) >> shift then
  x += bias + q*cmpl_freq, rans64.h:262-278) on 16-bit limbs
  (lanes.mulhi64).  The reciprocal path is also selectable at low
  prob_bits for A/B against the division path (``recip=`` argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RansConfig, Variant
from ..models import tables as tables_mod
from . import host_prep
from . import lanes

L_BITS = 31  # rans64.h:59


def pack_dec_tables(freqs, cum_freqs, sb: int):
    """Decode tables: the shared packed two-level layout up to prob_bits 16
    (host_prep.pack_sym4_fc), full-width (6,128) rows beyond (sym4 slot
    table would be 2^sb entries -- None; the kernel bisects instead)."""
    if sb <= 16:
        return host_prep.pack_sym4_fc(freqs, cum_freqs, sb)
    return None, host_prep.pack_wide_fc(freqs, cum_freqs)


def pack_enc_tables(freqs, cum_freqs) -> np.ndarray:
    """Per-symbol ((freq-1) << 16) | cum rows (shared, ops/host_prep.py);
    the division-path encode tables, valid to prob_bits 16."""
    return host_prep.pack_enc_fc_minus1(freqs, cum_freqs)


def pack_enc_tables_recip(freqs, cum_freqs, sb: int) -> np.ndarray:
    """Division-free encode tables (Rans64EncSymbolInit, rans64.h:167-247)
    as (12,128) int32: rows 0-1 rcp_freq lo32, 2-3 rcp_freq hi32, 4-5 bias,
    6-7 cmpl_freq, 8-9 rcp_shift, 10-11 renorm threshold freq << (31-sb)
    (the hi-word form of x_max, rans64.h:83)."""
    t = tables_mod.build_rans64_enc_tables(freqs, cum_freqs, sb)
    rcp_lo = (t.rcp_freq & 0xFFFFFFFF).astype(np.uint32)
    rcp_hi = (t.rcp_freq >> np.uint64(32)).astype(np.uint32)
    thr = (t.freq.astype(np.uint64) << np.uint64(31 - sb)).astype(np.uint32)
    return np.concatenate(
        [rcp_lo, rcp_hi, t.bias, t.cmpl_freq, t.rcp_shift, thr]
    ).view(np.int32).reshape(12, 128)


def _supports(cfg: RansConfig):
    if cfg.variant != Variant.RANS64:
        raise ValueError("rans64_tpu handles the RANS64 variant")
    if not 9 <= cfg.prob_bits <= 31:
        raise ValueError("TPU rans64 kernel needs 9 <= prob_bits <= 31")
    if cfg.n_lanes % 128 or cfg.n_lanes < 128:
        raise ValueError("TPU rans64 kernel needs n_lanes a multiple of 128")
    if cfg.lanes_per_stream != cfg.n_lanes:
        raise ValueError("TPU rans64 kernel uses one substream per block")
    if cfg.block_symbols % (4 * cfg.n_lanes):
        raise ValueError("TPU kernels need block_symbols to be a multiple "
                         "of 4*n_lanes (symbols travel 4-packed per int32)")


def _mul_u16_u64(freq, hi, lo, d):
    """(freq * (hi,lo) + d) mod 2^64 for freq <= 2^16, 0 <= d < freq,
    exact 16-bit limbs.

    Caller guarantees the true result < 2^63 (rANS invariant), so every
    partial term stays exact mod 2^32 in int32 lanes.  The decode advance's
    ``+ (slot - cum)`` rides along in t0 for free: slot always lies in
    [cum[s], cum[s+1]) -- that is how the symbol was found -- so d >= 0 and
    t0 = freq*u16 + d < 2^32 needs no sign/carry fixup (the reference's
    scalar u64 add, rans64.h:133, has no fixup to begin with).
    """
    t0 = freq * (lo & 0xFFFF) + d
    t1 = freq * lanes.srl(lo, 16)
    t2 = freq * hi
    mid = lanes.srl(t0, 16) + (t1 & 0xFFFF)
    new_lo = (t0 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    new_hi = lanes.srl(t1, 16) + lanes.srl(mid, 16) + t2
    return new_hi, new_lo


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------


def wmax_rows(R: int) -> int:
    """Worst-case window span in word-rows (1 word/lane/step = R rows,
    +offset spill), rounded to 8 sublanes for Mosaic slices."""
    return -(-(R + 2) // 8) * 8


def decode_cap_rows(max_words: int, R: int) -> int:
    """Stream buffer capacity (128-word rows) for ``max_words`` total words:
    body + the kernel's window span of overread pad."""
    N = R * 128
    body_rows = max(0, -(-(max_words - 2 * N) // 128))
    return -(-(body_rows + wmax_rows(R) + 1) // 8) * 8 \
        + lanes.BP_WINDOW_PAD_ROWS  # bp fetch loads an 8-aligned window


def _decode_kernel(*refs, T4: int, R: int, sb: int, ilp: int = 1,
                   hoist4: bool = False, ablate: str = "", bp: bool = True):
    # ``ablate`` is a BENCHMARK-ONLY hook (benchmarks/roofline_r64.py):
    # it stubs one pipeline stage with cheap dependency-preserving math so
    # the stage's cost can be measured by subtraction (the decode latency
    # roofline, docs/DESIGN.md).  Ablated kernels do NOT round-trip.
    #   "lookup" -- the bisect symbol search (constant-ish lookup instead)
    #   "fetch"  -- the monotone window fetch (keeps the prefix-sum scan)
    #   "scan"   -- the whole renorm scan + fetch
    #   "mul"    -- the 64-bit limb advance product
    if bp:  # byte-plane window scratches are the LAST 4 refs (scratch)
        refs, plane_refs = refs[:-4], refs[-4:]
    wide = sb > 16  # two-limb frequencies, full-width tables
    s4rows = 0 if wide else (1 << sb) // 512
    if wide or s4rows > 16:  # bisect path needs no cum2sym table in VMEM
        fc_ref, x0lo_ref, x0hi_ref, stream_ref, out_ref = refs
    else:
        sym4_ref, fc_ref, x0lo_ref, x0hi_ref, stream_ref, out_ref = refs
        sym4 = sym4_ref[:]
    if bp:  # hoist the stream's byte-plane split out of the symbol loop
        lanes.fill_byte_planes(plane_refs, stream_ref[:])
    fc = fc_ref[:]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(jnp.float32)
    M1 = lanes._as_i32((1 << sb) - 1)
    WMAX = wmax_rows(R)        # worst case: 1 word/lane -> R window rows
    cap_rows = stream_ref.shape[0] // ilp
    # loop-invariant first-level bisect keys (lanes.bisect_consts);
    # hoist4 also lifts the stride-16 level (8 keys, 7-select tree)
    lv = 4 if hoist4 else 3
    if wide:
        bconsts = lanes.bisect_consts(fc[4:6], (R, 128), fused=True,
                                      levels=lv)
    elif s4rows > 16:
        # fused=True also at sb == 16: the track2 search needs the
        # entry-255 reject-tracker seed
        bconsts = lanes.bisect_consts(fc[2:4], (R, 128), fused=True,
                                      levels=lv)
    else:
        bconsts = None

    def substep(hi, lo, base, spk, k, woff):
        slot = lo & M1
        if ablate == "lookup":
            # dependency-preserving stub: sym/freq/d still derive from slot
            sym = slot & 0xFF
            freq = (slot & 0x3FF) | 1
            cumv = jnp.zeros((R, 128), jnp.int32)
            d32 = slot & 1
        elif wide:
            # full-width tables (host_prep.pack_wide_fc), biased bisect
            # keys rows 4-5.  The search tracks BOTH neighbor keys (r5,
            # lanes.cum2sym_bisect_track2): acc = biased cum[sym], rej =
            # biased cum[sym+1], so freq = rej - acc and the advance's
            # (slot - cum[sym]) = probe - acc come out of the search with
            # NO per-symbol fc gather (the r4 form still paid a dependent
            # 2-row freq lookup) and no un-biasing xors (the common bias
            # cancels in the differences).  probe = slot ^ 2^31 collapses
            # to lo | 2^31 at sb == 31 (the & mask clears only the bit
            # the xor sets).
            probe = (lo | lanes.I32_MIN) if sb == 31 \
                else (slot ^ lanes.I32_MIN)
            sym, acc, rej = lanes.cum2sym_bisect_track2(
                fc[4:6], probe, (R, 128), consts=bconsts,
                acc_init=lanes.I32_MIN)  # biased cum[0] = 0 ^ 2^31
            freq = rej - acc
            d32 = probe - acc
        elif s4rows > 16:
            # binary search on cum beats the 4-packed cum2sym sweep
            # once the slot table exceeds 16 rows (prob_bits >= 14);
            # FUSED keys at sb <= 15 skip the fc gather (lanes.py)
            if sb <= 15:
                sym, freq, cumv = lanes.cum2sym_bisect_fused(
                    fc[2:4], slot, sb, (R, 128), consts=bconsts)
            else:
                # sb == 16: plain cum[s+1] keys; both tracked neighbors
                # give freq and cum with no fc gather (r5, as the wide
                # path; keys < 2^31 so no bias is involved)
                sym, acc, rej = lanes.cum2sym_bisect_track2(
                    fc[2:4], slot, (R, 128), consts=bconsts, acc_init=0)
                freq = rej - acc
                cumv = acc
        else:
            s4 = lanes.table_lookup(sym4, lanes.srl(slot, 2), s4rows,
                                    (R, 128))
            sym = lanes.srl(s4, (slot & 3) << 3) & 0xFF
            e = lanes.table_lookup(fc, sym, 2, (R, 128))
            freq = lanes.srl(e, 16) + 1  # fc packs freq-1 (host_prep)
            cumv = e & 0xFFFF
        # advance: x = freq * (x >> sb) + (slot - cum)  (rans64.h:126-133);
        # slot - cum is in [0, freq) by construction of the symbol lookup,
        # so it folds into the limb product (one-limb) or needs only a
        # non-negative carry (two-limb)
        y_lo = lanes.srl(lo, sb) | (hi << (32 - sb))
        if ablate == "mul":
            dd = d32 if wide else slot - cumv
            hi, lo = lanes.srl(hi, sb) ^ freq, y_lo + dd
        elif wide:
            d = d32
            if sb == 31:
                # x < 2^63 makes y = x >> 31 pure 32-bit (y_hi provably
                # 0): the 32x64 schoolbook collapses to 4 partials (r5)
                hi, lo = lanes.mul_u32_u32_64(freq, y_lo, d)
            else:
                y_hi = lanes.srl(hi, sb)
                hi, lo = lanes.mul_u32_u64(freq, y_hi, y_lo, d)
        else:
            y_hi = lanes.srl(hi, sb)
            d = slot - cumv
            hi, lo = _mul_u16_u64(freq, y_hi, y_lo, d)
        spk = spk | (sym << (8 * k))
        # renorm: <=1 whole word (rans64.h:134-139); monotone
        # two-candidate fetch: a row of 128 lanes consumes <=128 words
        # = one window row, so rel stays within {row_rel, row_rel+1}
        m = (hi == 0) & (lo >= 0)          # x < 2^31
        if ablate == "scan":
            hi2 = jnp.where(m, lo, hi)
            lo2 = jnp.where(m, lo ^ 1, lo)
            return hi2, lo2, base + 1, spk
        mf = m.astype(jnp.float32)
        incl, total, rowstart = lanes.lane_prefix_sum_rows(mf, tri, R)
        if ablate == "fetch":
            wv = incl ^ lo
        else:
            gidx = base + jnp.where(m, incl - 1, 0)
            brow = jax.lax.shift_right_logical(base, 7)
            row_rel = jax.lax.shift_right_logical(base + rowstart, 7) - brow
            rel = jax.lax.shift_right_logical(gidx, 7) - brow
            col = gidx & 127
            if bp:
                # int8 dynamic loads need an 8-aligned offset
                # (pl.multiple_of); round brow down and widen the span
                base8 = (brow // 8) * 8
                off = pl.multiple_of(woff + base8, 8)
                dlt = brow - base8

                # NOTE (r5 dead end): a lax.cond picking a 48-row narrow
                # window for typical substeps (~20 rows touched vs the
                # 144-row worst case) round-trips but measures ~35%
                # SLOWER -- per-substep control flow serializes the
                # interleaved ilp chains the scheduler otherwise overlaps
                # (probe vs VARIANTS_r05 same shape).  Unconditional
                # full-width fetch stays.
                win = [p[pl.ds(off, WMAX + lanes.BP_WINDOW_PAD_ROWS), :]
                       for p in plane_refs]
                wv = lanes.window_fetch_mono_bp(win, row_rel + dlt,
                                                rel + dlt, col, (R, 128))
            else:
                win = stream_ref[pl.ds(woff + brow, WMAX), :]
                wv = lanes.window_fetch_mono(win, row_rel, rel, col, WMAX,
                                             (R, 128))
        hi = jnp.where(m, lo, hi)
        lo = jnp.where(m, wv, lo)
        return hi, lo, base + total, spk

    def body(i4, carry):
        his, los, bases = (list(carry[0]), list(carry[1]), list(carry[2]))
        sps = [jnp.zeros((R, 128), jnp.int32) for _ in range(ilp)]
        for k in range(4):
            # ilp independent blocks interleave their dependency chains
            # (block-level 2-way interleave; see word_tpu)
            for j in range(ilp):
                his[j], los[j], bases[j], sps[j] = substep(
                    his[j], los[j], bases[j], sps[j], k, j * cap_rows)
        for j in range(ilp):
            out_ref[pl.ds((j * T4 + i4) * R, R), :] = sps[j]
        return (tuple(his), tuple(los), tuple(bases))

    xh, xl = x0hi_ref[:], x0lo_ref[:]
    jax.lax.fori_loop(
        0, T4, body,
        (tuple(xh[j * R:(j + 1) * R] for j in range(ilp)),
         tuple(xl[j * R:(j + 1) * R] for j in range(ilp)),
         tuple(jnp.int32(0) for _ in range(ilp))))


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "interpret", "ilp",
                                             "hoist4", "ablate", "bp"))
def decode_blocks(sym4_rows, fc_rows, x0_lo, x0_hi, stream_rows, *, T4: int,
                  R: int, sb: int, cap_rows: int, n_blocks: int,
                  interpret: bool = False, ilp: int = 1,
                  hoist4: bool = False, ablate: str = "", bp: bool = True):
    """Grid decode.  stream_rows: (n_blocks*cap_rows, 128) raw u32 words."""
    if not interpret and R < 2:
        raise ValueError("compiled TPU decode needs n_lanes >= 256")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    s4rows = (1 << sb) // 512
    bisect = sb > 16 or s4rows > 16
    tab_specs = [] if bisect else [
        pl.BlockSpec((s4rows, 128), lambda b: (0, 0),
                     memory_space=pltpu.VMEM)]
    tab_args = [] if bisect else [sym4_rows]
    fc_shape = (6, 128) if sb > 16 else (4, 128)
    return pl.pallas_call(
        functools.partial(_decode_kernel, T4=T4, R=R, sb=sb, ilp=ilp,
                          hoist4=hoist4, ablate=ablate, bp=bp),
        grid=(n_blocks // ilp,),
        out_shape=jax.ShapeDtypeStruct((n_blocks * T4 * R, 128), jnp.int32),
        in_specs=tab_specs + [
            pl.BlockSpec(fc_shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
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
        # big-block shapes exceed the 16M default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(*tab_args, fc_rows, x0_lo, x0_hi, stream_rows)


# ---------------------------------------------------------------------------
# Encode kernel
# ---------------------------------------------------------------------------


def _encode_kernel(fc_ref, in_ref, emitw_ref, emitv_ref, xlo_ref, xhi_ref,
                   *, T4: int, R: int, sb: int, ilp: int = 1,
                   recip: bool = False):
    fc = fc_ref[:]
    SH = 31 - sb  # x_max hi word = freq << (31 - sb)  (rans64.h:83)

    def substep_div(hi, lo, spk, k, t4, eoff):
        sym = lanes.srl(spk, 8 * k) & 0xFF
        e = lanes.table_lookup(fc, sym, 2, (R, 128))
        freq = lanes.srl(e, 16) + 1
        start = e & 0xFFFF
        # renorm: x >= freq << (63-sb)  <=>  hi >= freq << (31-sb)
        m = lanes.uge(hi, freq << SH)
        emitw_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = jnp.where(m, lo, 0)
        emitv_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = m.astype(jnp.int32)
        lo = jnp.where(m, hi, lo)
        hi = jnp.where(m, 0, hi)
        # x = (x/f) << sb + (x%f) + start: 64/16 schoolbook division
        rem = jnp.zeros((R, 128), jnp.int32)
        qs = []
        for limb in (lanes.srl(hi, 16), hi & 0xFFFF,
                     lanes.srl(lo, 16), lo & 0xFFFF):
            cur = (rem << 16) | limb
            qi, rem = lanes.exact_div(cur, freq)
            qs.append(qi)
        q_hi = (qs[0] << 16) | qs[1]
        q_lo = (qs[2] << 16) | qs[3]
        new_lo = q_lo << sb
        new_hi = (q_hi << sb) | lanes.srl(q_lo, 32 - sb)
        a = rem + start
        s = new_lo + a
        new_hi = new_hi + jnp.where(lanes.ugt(new_lo, s), 1, 0)
        return new_hi, s

    def substep_recip(hi, lo, spk, k, t4, eoff):
        # Rans64EncPutSymbol's division-free form (rans64.h:262-278):
        # q = mulhi64(x, rcp_freq) >> rcp_shift; x += bias + q*cmpl_freq.
        # Tables: pack_enc_tables_recip; exact for the full state range by
        # the Alverson reciprocal construction (rans64.h:167-247).
        sym = lanes.srl(spk, 8 * k) & 0xFF
        rcp_lo = lanes.table_lookup(fc[0:2], sym, 2, (R, 128))
        rcp_hi = lanes.table_lookup(fc[2:4], sym, 2, (R, 128))
        bias = lanes.table_lookup(fc[4:6], sym, 2, (R, 128))
        cmpl = lanes.table_lookup(fc[6:8], sym, 2, (R, 128))
        shv = lanes.table_lookup(fc[8:10], sym, 2, (R, 128))
        thr = lanes.table_lookup(fc[10:12], sym, 2, (R, 128))
        m = lanes.uge(hi, thr)  # renorm (rans64.h:81-89)
        emitw_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = jnp.where(m, lo, 0)
        emitv_ref[pl.ds(eoff + (4 * t4 + k) * R, R), :] = m.astype(jnp.int32)
        lo = jnp.where(m, hi, lo)
        hi = jnp.where(m, 0, hi)
        q_hi, q_lo = lanes.mulhi64(hi, lo, rcp_hi, rcp_lo)
        q_hi, q_lo = lanes.srl64(q_hi, q_lo, shv)  # rcp_shift <= 30
        # bias < 2^31 folds into q*cmpl_freq's low limb columns (r4):
        # x += bias + q*cmpl_freq (rans64.h:277) in ONE 64-bit add
        p_hi, p_lo = lanes.mul_u32_u64(cmpl, q_hi, q_lo, bias)
        return lanes.add64(hi, lo, p_hi, p_lo)

    substep = substep_recip if recip else substep_div

    def body(i4, carry):
        his, los = list(carry[0]), list(carry[1])
        t4 = T4 - 1 - i4
        spks = [in_ref[pl.ds((j * T4 + t4) * R, R), :] for j in range(ilp)]
        for k in (3, 2, 1, 0):
            # ilp independent blocks interleave their dependency chains
            for j in range(ilp):
                his[j], los[j] = substep(his[j], los[j], spks[j], k, t4,
                                         j * 4 * T4 * R)
        return tuple(his), tuple(los)

    his, los = jax.lax.fori_loop(
        0, T4, body,
        (tuple(jnp.zeros((R, 128), jnp.int32) for _ in range(ilp)),
         tuple(jnp.full((R, 128), lanes.I32_MIN, jnp.int32)
               for _ in range(ilp))))  # x = L
    for j in range(ilp):
        xlo_ref[pl.ds(j * R, R), :] = los[j]
        xhi_ref[pl.ds(j * R, R), :] = his[j]


@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "n_blocks",
                                             "interpret", "ilp", "recip"))
def encode_blocks(fc_rows, syms_packed, *, T4: int, R: int, sb: int,
                  n_blocks: int, interpret: bool = False, ilp: int = 1,
                  recip: bool = False):
    """Returns (emit words, emit valid, state lo, state hi).

    recip=False: 64/16 schoolbook division, fc_rows (2,128), prob_bits<=16.
    recip=True: Alverson-reciprocal path, fc_rows (12,128), any prob_bits.
    """
    if not interpret and R < 2:
        raise ValueError("compiled TPU encode needs n_lanes >= 256")
    if n_blocks % ilp:
        raise ValueError(f"n_blocks={n_blocks} not divisible by ilp={ilp}")
    return pl.pallas_call(
        functools.partial(_encode_kernel, T4=T4, R=R, sb=sb, ilp=ilp,
                          recip=recip),
        grid=(n_blocks // ilp,),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * 4 * T4 * R, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * 4 * T4 * R, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * R, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * R, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((12, 128) if recip else (2, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ilp * 4 * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * 4 * T4 * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ilp * R, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        # two emit outputs (word + valid) put even ilp=2 small-block shapes
        # past the 16M default scoped-vmem limit; v5e has 128M VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=host_prep.VMEM_LIMIT),
        interpret=interpret,
    )(fc_rows, syms_packed)


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cap_words", "n_blocks"))
def compact_emissions(emit_w, emit_v, x_lo, x_hi, cap_words: int,
                      n_blocks: int = 1):
    """Dense (word, valid) cells -> per-block u32 word buffers + counts.

    Head = flushed states as 2 LE u32 words per lane, lane-ascending
    (Rans64EncFlush, rans64.h:96-103).
    """
    R = x_lo.shape[0] // n_blocks
    N = R * 128
    w = emit_w.reshape(n_blocks, -1)
    v = emit_v.reshape(n_blocks, -1)
    pos = jnp.cumsum(v, axis=1) - v
    totals = jnp.sum(v, axis=1)
    idx = jnp.where(v == 1, pos, cap_words)
    body = jnp.zeros((n_blocks, cap_words), jnp.int32)
    body = jax.vmap(lambda b, i, ww: b.at[i].set(ww, mode="drop"))(
        body, idx, w)
    lo = x_lo.reshape(n_blocks, N)
    hi = x_hi.reshape(n_blocks, N)
    head = jnp.stack([lo, hi], axis=2).reshape(n_blocks, 2 * N)
    return jnp.concatenate([head, body], axis=1), totals + 2 * N


@functools.partial(jax.jit, static_argnames=("R", "cap_rows", "n_blocks"))
def prep_decode(words_i32, R: int, cap_rows: int, n_blocks: int = 1):
    """(n_blocks, head+body) u32 words -> (x0_lo, x0_hi, stream rows)."""
    N = R * 128
    head = words_i32[:, :2 * N].reshape(n_blocks, N, 2)
    x0_lo = head[:, :, 0].reshape(n_blocks * R, 128)
    x0_hi = head[:, :, 1].reshape(n_blocks * R, 128)
    body = words_i32[:, 2 * N:]
    pad = cap_rows * 128 - body.shape[1]
    if pad < 0:
        body = body[:, :cap_rows * 128]
    else:
        body = jnp.concatenate(
            [body, jnp.zeros((n_blocks, pad), jnp.int32)], axis=1)
    return x0_lo, x0_hi, body.reshape(n_blocks * cap_rows, 128)




@functools.partial(jax.jit, static_argnames=("T4", "R", "sb", "cap_rows",
                                             "n_blocks", "interpret", "ilp"))
def decode_fused(sym4_rows, fc_rows, buf_i32, *, T4: int, R: int, sb: int,
                 cap_rows: int, n_blocks: int, interpret: bool = False,
                 ilp: int = 1):
    """One fused jit: stream prep -> kernel -> symbol unpack (device out)."""
    from . import word_tpu
    x0_lo, x0_hi, stream = prep_decode(buf_i32, R, cap_rows, n_blocks)
    spk = decode_blocks(sym4_rows, fc_rows, x0_lo, x0_hi, stream, T4=T4,
                        R=R, sb=sb, cap_rows=cap_rows, n_blocks=n_blocks,
                        interpret=interpret, ilp=ilp)
    return word_tpu.unpack_symbols(spk, T4, R, n_blocks)


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


_default_interpret = host_prep.default_interpret
_split_blocks = host_prep.split_blocks


def encode(cfg: RansConfig, data: np.ndarray, freqs, cum_freqs,
           interpret: bool | None = None):
    """Encode on TPU -> (list of per-block uint32 word arrays, padded size)."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    from . import word_tpu
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    padded, _ = word_tpu.pad_block(data if not isinstance(data, np.ndarray)
                          else np.asarray(data, np.uint8), N, freqs)
    # prob_bits > 16 needs the reciprocal path (frequencies exceed the
    # division path's one-limb range); below that the 64/16 schoolbook
    # division measures faster on v5e (fewer table gathers)
    recip = cfg.prob_bits > 16
    fc_rows = jnp.asarray(
        pack_enc_tables_recip(freqs, cum_freqs, cfg.prob_bits) if recip
        else pack_enc_tables(freqs, cum_freqs))
    n_full, tail = _split_blocks(cfg, padded.size)
    B = cfg.block_symbols

    # Pipelined dispatch (r5): enqueue every group's transfer + kernels
    # WITHOUT blocking, fetch afterwards (host_prep.block_groups).
    pend: list = []

    def dispatch(chunk: np.ndarray, n_blocks: int):
        T = chunk.size // n_blocks // N
        T4 = T // 4
        spk = word_tpu.pack_symbols(jnp.asarray(chunk), T4, R, n_blocks)
        # emit word+valid 8 B/sym + packed input 1 B/sym (host_prep.pick_ilp)
        ew, ev, xlo, xhi = encode_blocks(fc_rows, spk, T4=T4, R=R,
                                         sb=cfg.prob_bits, n_blocks=n_blocks,
                                         interpret=interpret, recip=recip,
                                         ilp=host_prep.pick_ilp(
                                             n_blocks, 9 * T * N))
        cap = T * N  # <=1 word per symbol
        pend.append((*compact_emissions(ew, ev, xlo, xhi, cap, n_blocks),
                     n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(padded[g * B:(g + nb) * B], nb)
    if tail:
        dispatch(padded[n_full * B:], 1)

    out_blocks: list[np.ndarray] = []
    for buf, n_words, n_blocks in pend:
        n_np = np.asarray(n_words)  # one fetch per group, not per block
        mx = max(int(n_np.max()), 1)
        # trim to the longest block ON DEVICE before the d2h fetch (r5)
        buf_np = np.asarray(buf[:, :mx]).view(np.uint32)
        for b in range(n_blocks):
            out_blocks.append(buf_np[b, :int(n_np[b])].copy())
    return out_blocks, padded.size


def decode(cfg: RansConfig, word_blocks: list[np.ndarray],
           n_symbols_padded: int, freqs, cum_freqs,
           interpret: bool | None = None) -> np.ndarray:
    """Decode per-block u32 word buffers on TPU -> uint8 symbols."""
    _supports(cfg)
    if interpret is None:
        interpret = _default_interpret()
    from . import word_tpu
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    s4, fc = pack_dec_tables(freqs, cum_freqs, cfg.prob_bits)
    sym4_rows = jnp.asarray(s4) if s4 is not None else None
    fc_rows = jnp.asarray(fc)
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
        buf = np.zeros((n_blocks, max_words), np.uint32)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b
        x0_lo, x0_hi, stream = prep_decode(
            jnp.asarray(buf.view(np.int32)), R, cap_rows, n_blocks)
        spk = decode_blocks(sym4_rows, fc_rows, x0_lo, x0_hi, stream,
                            T4=T4, R=R, sb=cfg.prob_bits, cap_rows=cap_rows,
                            n_blocks=n_blocks, interpret=interpret,
                            ilp=host_prep.pick_ilp(
                                n_blocks, n_symbols_block + cap_rows * 512
                                + cap_rows * 128
                                * lanes.BP_PLANE_BYTES_PER_CELL // 2,
                                prefer=(4, 3, 2)))
        pend.append(word_tpu.unpack_symbols(spk, T4, R, n_blocks))

    for g, nb in host_prep.block_groups(n_full):
        dispatch(word_blocks[g:g + nb], cfg.block_symbols)
    if tail:
        dispatch(word_blocks[n_full:],
                 n_symbols_padded - n_full * cfg.block_symbols)
    outs = [np.asarray(p) for p in pend]
    return np.concatenate(outs) if outs else np.zeros(0, np.uint8)
