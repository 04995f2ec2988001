"""Shared vector-lane primitives for the TPU rANS kernels.

These are the TPU-native replacements for the reference's SIMD idioms
(rans_word_sse41.h:151-227): per-lane table lookups become
gather-and-select sweeps over vreg rows, the movemask/shuffle-LUT renorm
becomes a triangular-matmul prefix sum feeding a window gather, and unsigned
compares use the same xor-bias trick as the reference's SSE path
(rans_word_sse41.h:210-216) because lane values live in int32 vregs.

Everything here works both inside Pallas kernels and in plain jnp (the
pure-XLA fallback path), so the codec logic is written once.

Measured on TPU v5e (see docs/DESIGN.md): one (R,128) lane-gather ~80ns with
~30ns marginal cost when pipelined; a 4096-entry lookup via 32 row sweeps
~140ns; the full word-variant decode step at R=32 with 4x unroll ~270ns for
4096 symbols (~15 GB/s bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

I32_MIN = -2147483648  # plain int so jnp inlines it as a literal, never a
                       # captured device constant (Pallas kernels reject those)


def _as_i32(v: int) -> int:
    """Reinterpret a uint32 value as two's-complement int32."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def ult(a, b_const: int):
    """Unsigned a < b_const for int32 lanes holding uint32 bit patterns.

    xor-bias converts unsigned order to signed order (the reference does the
    same for SSE, rans_word_sse41.h:210-216).
    """
    return (a ^ I32_MIN) < jnp.int32(_as_i32(b_const ^ 0x80000000))


def uge(a, b):
    """Unsigned a >= b, both int32 lanes with uint32 bit patterns."""
    return (a ^ I32_MIN) >= (b ^ I32_MIN)


def ugt(a, b):
    """Unsigned a > b, both int32 lanes with uint32 bit patterns."""
    return (a ^ I32_MIN) > (b ^ I32_MIN)


def srl(x, n):
    """Logical right shift on int32 lanes."""
    return jax.lax.shift_right_logical(x, jnp.int32(n) if isinstance(n, int) else n)


def table_lookup(table_rows, idx, rows: int, shape):
    """Gather ``table[idx]`` for a table laid out as (rows, 128) int32.

    Entry e lives at (e >> 7, e & 127).  Lowered as ``rows`` lane-gathers
    from broadcast rows + selects; the gathers pipeline on the VPU so this
    stays cheap even at 32 rows (~140ns for 4096 entries, measured).
    """
    col = idx & 127
    row = srl(idx, 7)
    out = jnp.zeros(shape, jnp.int32)
    for r in range(rows):
        tr = jnp.broadcast_to(table_rows[r:r + 1, :], shape)
        v = jnp.take_along_axis(tr, col, axis=1)
        out = jnp.where(row == r, v, out)
    return out


def row_gather(row128, col, shape):
    """Single-row lane gather: ``row128[0, col]`` per lane for a (1,128)
    table (table_lookup without the row-select, for <=128-entry tables)."""
    return jnp.take_along_axis(jnp.broadcast_to(row128, shape), col, axis=1)


def cum2sym_bisect(cn_rows, slot, shape, consts=None):
    """slot -> symbol via branchless rank search over a (2,128) table of
    full-width cum[s+1] keys (rows 2-3 of host_prep.pack_sym4_fc's table,
    rows 4-5 of pack_wide_fc's).

    The vector analog of std::upper_bound on cum_freqs: the answer is the
    minimal s with cum[s+1] > slot, computed as the rank
    #{s : cum[s+1] <= slot} by 8 halving steps + unsigned compare.
    Full-width keys (not a 16-bit packed field) make prob_bits 16 -- and
    RANS64's 31 -- exact: cum[s+1] reaches M itself for every symbol past
    the last present one, and the rank form is correct for absent-symbol
    runs at either end of the alphabet.

    Keys are parity-interleaved (key e at row e & 1, col e >> 1): every
    stride >= 2 probes entry lo + step - 1 with lo even, i.e. an ODD
    entry (row 1), and the final stride-1 step probes even entry lo
    (row 0) -- so each step is ONE single-row take_along_axis instead of
    a two-row sweep-and-select.

    Compares are plain SIGNED int32 (r4): every caller's keys and probe
    values are provably < 2^31 (cum[s+1] <= 2^16 here; fused keys
    < 2^31 at sb <= 15; the wide RANS64 tables are pre-xor-biased by
    pack_wide_fc and searched via cum2sym_bisect_track, which biases the
    probe to match), so the xor-bias unsigned-compare trick costs ~16
    elementwise ops per lookup for nothing.

    The first three levels probe entries from tiny CONSTANT sets ({127},
    {63,191}, {31,95,159,223}); their keys are loop-invariant, so decode
    kernels hoist them out of the hot loop via ``bisect_consts`` and
    resolve each level with selects instead of gathers -- 5 in-loop
    gathers per lookup instead of 8 (4 with ``bisect_consts(levels=4)``,
    which also hoists the stride-16 level's 8 candidates).  Beats
    sweeping the packed cum2sym slot table when that table exceeds ~16
    rows (prob_bits >= 14); below that the direct sweep wins (see
    byte_tpu/rans64_tpu call sites).
    """
    row0 = jnp.broadcast_to(cn_rows[0:1], shape)
    row1 = jnp.broadcast_to(cn_rows[1:2], shape)
    if consts is None:
        consts = bisect_consts(cn_rows, shape)
    k127, k63, k191, k31, k95, k159, k223 = consts[:7]
    a1 = slot >= k127
    lo = jnp.where(a1, 128, 0)
    ev = jnp.where(a1, k191, k63)            # entry lo + 63
    a2 = slot >= ev
    lo = lo + jnp.where(a2, 64, 0)
    ev = jnp.where(a1, jnp.where(a2, k223, k159),
                   jnp.where(a2, k95, k31))  # entry lo + 31
    a3 = slot >= ev
    lo = lo + jnp.where(a3, 32, 0)
    steps = (16, 8, 4, 2)
    if len(consts) == 15:  # stride-16 level hoisted (bisect_consts levels=4)
        ev = _level4_select(a1, a2, a3, consts[7:])
        lo = lo + jnp.where(slot >= ev, 16, 0)
        steps = (8, 4, 2)
    for step in steps:
        e = lo + (step - 1)  # odd entry -> row 1
        cv = jnp.take_along_axis(row1, srl(e, 1), axis=1)
        lo = jnp.where(slot >= cv, lo + step, lo)
    cv = jnp.take_along_axis(row0, srl(lo, 1), axis=1)  # even entry lo
    return jnp.where(slot >= cv, lo + 1, lo)


def _level4_select(a1, a2, a3, ks):
    """Entry lo + 15 for lo = 128*a1 + 64*a2 + 32*a3: a 7-select tree over
    the 8 hoisted stride-16 keys (entries 15, 47, ..., 239)."""
    k15, k47, k79, k111, k143, k175, k207, k239 = ks
    return jnp.where(
        a1,
        jnp.where(a2, jnp.where(a3, k239, k207),
                  jnp.where(a3, k175, k143)),
        jnp.where(a2, jnp.where(a3, k111, k79),
                  jnp.where(a3, k47, k15)))


def cum2sym_bisect_fused(cn_rows, slot, sb: int, shape, consts=None):
    """cum2sym_bisect over FUSED keys (cum[s+1] << sb) | (freq-1), valid
    for prob_bits <= 15 (host_prep.pack_sym4_fc rows 2-3).

    Returns (sym, freq, cum[sym]) with NO separate fc lookup: comparing
    key <= (slot << sb) | (2^sb - 1) is exactly cum[s+1] <= slot (the low
    freq bits cannot flip the inequality), and the search's LAST REJECTED
    probe is entry[sym] -- binary search maintains sym in (lo, last_reject]
    and ends with last_reject == sym -- which carries freq[sym] (low bits)
    and cum[sym+1] (high bits), hence cum[sym] = cum[sym+1] - freq[sym].
    The all-accept path (sym = 255) never probes entry 255, so the reject
    tracker initializes to that key (loop-invariant, in ``consts``).
    """
    sym, _, eab = _bisect_core(cn_rows, (slot << sb) | ((1 << sb) - 1),
                               shape, consts)
    freq = (eab & ((1 << sb) - 1)) + 1
    cumv = srl(eab, sb) - freq
    return sym, freq, cumv


def cum2sym_bisect_track2(cn_rows, t, shape, consts=None,
                          acc_init: int = 0):
    """Rank search returning (sym, key[sym-1], key[sym]) -- BOTH neighbors
    of the answer tracked through the selects (r5).

    The search maintains sym in (last_accept, last_reject]; at the end
    last_accept == sym-1 and last_reject == sym, so with keys = cum[s+1]
    the two trackers ARE cum[sym] and cum[sym+1]: freq = rej - acc and
    slot - cum[sym] = probe - acc, with NO per-symbol fc table gather at
    all (the r3/r4 forms still paid a dependent 2-row freq lookup on the
    wide RANS64 path).  Biased keys (pack_wide_fc) need no un-biasing:
    both outputs carry the same bias, which cancels in the differences.

    ``acc_init`` seeds the accept tracker for the sym == 0 path (no probe
    ever accepts): key[-1] = cum[0] = 0, i.e. 0 for plain keys and
    I32_MIN for xor-biased ones.  Must be a plain Python int (Pallas
    rejects captured device constants).
    """
    return _bisect_core(cn_rows, t, shape, consts, acc_init=acc_init)


def cum2sym_bisect_track(cn_rows, slot, shape, consts=None):
    """cum2sym_bisect over plain full-width cum[s+1] keys that ALSO returns
    cum[sym+1] from the search's last rejected probe (see
    cum2sym_bisect_fused -- same invariant, unpacked keys).

    For tables whose freq/cum fields exceed any packed 16-bit split
    (RANS64 prob_bits 16..31, host_prep.pack_wide_fc rows 4-5): the
    decode advance needs (freq, cum[sym]); with cum[sym+1] tracked free,
    one freq gather + ``cum[sym] = cum[sym+1] - freq`` replaces the
    separate cum table lookup.

    cum[s+1] reaches 2^31 exactly at prob_bits 31, so pack_wide_fc
    stores the key rows xor-biased (key ^ 2^31); biasing the probe the
    same way turns the search's signed compares into exact unsigned
    order (the reference's own SSE trick, rans_word_sse41.h:210-216) at
    ONE xor per lookup instead of two per level (r4).  The tracked
    entry comes back biased and is un-biased here.
    """
    sym, _, eab = _bisect_core(cn_rows, slot ^ I32_MIN, shape, consts)
    return sym, eab ^ I32_MIN


def _bisect_core(cn_rows, t, shape, consts, acc_init: int = 0):
    """Branchless 8-level rank search: sym = #{s : key[s] <= t} over 256
    parity-interleaved keys, tracking BOTH neighbors of the answer
    through the selects: the last ACCEPTED probe's key (entry[sym-1],
    seeded with ``acc_init`` for the never-accepts sym == 0 path) and the
    last REJECTED probe's key (entry[sym]; the search maintains sym in
    (last_accept, last_reject]).  The all-accept path (sym = 255) never
    probes entry 255, so the reject tracker initializes to that key
    (loop-invariant, in ``consts``).  Compares are plain SIGNED int32 --
    callers guarantee key order under signed compare (fused keys < 2^31;
    the wide path pre-biases keys and probe, cum2sym_bisect_track).
    Returns (sym, entry[sym-1], entry[sym]); callers that ignore the
    accept tracker cost nothing (its selects dead-code-eliminate)."""
    row0 = jnp.broadcast_to(cn_rows[0:1], shape)
    row1 = jnp.broadcast_to(cn_rows[1:2], shape)
    if consts is None:
        consts = bisect_consts(cn_rows, shape, fused=True)
    k127, k63, k191, k31, k95, k159, k223, k255 = consts[:8]
    eab = k255                               # last rejected probe's key
    acw = jnp.full(shape, acc_init, jnp.int32)  # last accepted probe's key
    a1 = t >= k127
    lo = jnp.where(a1, 128, 0)
    eab = jnp.where(a1, eab, k127)
    acw = jnp.where(a1, k127, acw)
    ev = jnp.where(a1, k191, k63)            # entry lo + 63
    a2 = t >= ev
    lo = lo + jnp.where(a2, 64, 0)
    eab = jnp.where(a2, eab, ev)
    acw = jnp.where(a2, ev, acw)
    ev = jnp.where(a1, jnp.where(a2, k223, k159),
                   jnp.where(a2, k95, k31))  # entry lo + 31
    a3 = t >= ev
    lo = lo + jnp.where(a3, 32, 0)
    eab = jnp.where(a3, eab, ev)
    acw = jnp.where(a3, ev, acw)
    steps = (16, 8, 4, 2)
    if len(consts) == 16:  # stride-16 level hoisted (bisect_consts levels=4)
        ev = _level4_select(a1, a2, a3, consts[8:])
        a4 = t >= ev
        lo = lo + jnp.where(a4, 16, 0)
        eab = jnp.where(a4, eab, ev)
        acw = jnp.where(a4, ev, acw)
        steps = (8, 4, 2)
    for step in steps:
        e = lo + (step - 1)  # odd entry -> row 1
        cv = jnp.take_along_axis(row1, srl(e, 1), axis=1)
        acc = t >= cv
        lo = jnp.where(acc, lo + step, lo)
        eab = jnp.where(acc, eab, cv)
        acw = jnp.where(acc, cv, acw)
    cv = jnp.take_along_axis(row0, srl(lo, 1), axis=1)  # even entry lo
    acc = t >= cv
    sym = jnp.where(acc, lo + 1, lo)
    eab = jnp.where(acc, eab, cv)
    acw = jnp.where(acc, cv, acw)
    return sym, acw, eab


def bisect_consts(cn_rows, shape, fused: bool = False, levels: int = 3):
    """Loop-invariant keys for cum2sym_bisect's first three levels:
    entries (127), (63, 191), (31, 95, 159, 223) -- all odd, row 1 of the
    parity-interleaved layout; the fused variant also needs entry 255
    (the reject-tracker init).  ``levels=4`` additionally hoists the
    stride-16 level's 8 candidates (entries 15, 47, ..., 239), trading
    one dependent in-loop gather for a 7-select tree (A/B per kernel).
    Compute ONCE per kernel invocation (outside the symbol loop) and
    pass via ``consts=``."""
    row1 = jnp.broadcast_to(cn_rows[1:2], shape)

    def g(entry):
        col = jnp.full(shape, entry >> 1, jnp.int32)
        return jnp.take_along_axis(row1, col, axis=1)

    base = (g(127), g(63), g(191), g(31), g(95), g(159), g(223))
    if fused:
        base = base + (g(255),)
    if levels >= 4:
        base = base + tuple(g(15 + 32 * i) for i in range(8))
    return base


def lane_prefix_sum_rows(mask_f32, tri, R: int):
    """lane_prefix_sum that also returns per-row start offsets.

    Returns (inclusive_prefix (R,128) i32, total i32, row_start (R,1) i32)
    where row_start[r] = number of set lanes in rows < r (the flattened
    exclusive prefix at each row's first lane).
    """
    cs = jnp.dot(mask_f32, tri, preferred_element_type=jnp.float32)
    rowtot = cs[:, 127:128]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    lower = (cols_i < rows_i).astype(jnp.float32)
    cross = jnp.dot(lower, jnp.broadcast_to(rowtot, (R, 128)),
                    preferred_element_type=jnp.float32)[:, :1]
    incl = (cs + cross).astype(jnp.int32)
    total = jnp.sum(mask_f32).astype(jnp.int32)
    return incl, total, cross.astype(jnp.int32)


def lane_prefix_sum_rows_i8(mask_i8, tri_i8, R: int):
    """lane_prefix_sum_rows on int8 operands (r5 A/B): the triangular dot
    runs as an exact int8 x int8 -> int32 MXU pass with no float converts
    on the mask or the result.  Per-row counts (<= 256 for masks <= 2)
    keep the cross dot exact in bf16-truncated f32."""
    cs = jnp.dot(mask_i8, tri_i8, preferred_element_type=jnp.int32)
    rowtot = cs[:, 127:128]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    lower = (cols_i < rows_i).astype(jnp.float32)
    cross = jnp.dot(lower,
                    jnp.broadcast_to(rowtot.astype(jnp.float32), (R, 128)),
                    preferred_element_type=jnp.float32)[:, :1].astype(
                        jnp.int32)
    incl = cs + cross
    total = jnp.sum(rowtot)
    return incl, total, cross


def window_fetch_mono(window, row_rel, rel, col, W: int, shape):
    """Monotone window gather: ``window[rel, col]`` per lane when ``rel`` is
    non-decreasing in flattened lane order AND spans at most TWO values
    within each sublane row (true for rANS renorm: one row of 128 lanes
    consumes at most 128 stream cells < one window row).

    Fetches the two candidate window rows per sublane row with one-hot MXU
    matmuls -- exact in fp32 by splitting each int32 cell into 16-bit
    halves -- then resolves per lane with two lane-gathers and one select.
    O(4 matmuls + 2 gathers) regardless of window span, replacing an
    O(W) row sweep.
    """
    a, b = _mono_candidates(window, row_rel, W, shape)
    va = jnp.take_along_axis(a, col, axis=1)
    vb = jnp.take_along_axis(b, col, axis=1)
    return jnp.where(rel == row_rel, va, vb)


def window_fetch_mono2(window, row_rel, rels, cols, W: int, shape):
    """window_fetch_mono for several (rel, col) index pairs sharing one
    candidate fetch (the BYTE variant's two refill bytes per symbol)."""
    a, b = _mono_candidates(window, row_rel, W, shape)
    outs = []
    for rel, col in zip(rels, cols):
        va = jnp.take_along_axis(a, col, axis=1)
        vb = jnp.take_along_axis(b, col, axis=1)
        outs.append(jnp.where(rel == row_rel, va, vb))
    return tuple(outs)


def window_fetch_mono_bp(win, row_rel, rel, col, shape):
    """Monotone window gather over BYTE-PLANE windows (r5).

    ``win`` is the four 8-bit fields of the stream window as (W, 128)
    int8 plane slices (biased by -128 to fit the signed dtype), prepared
    ONCE per grid step into VMEM scratch (the r2 byte-plane dead end paid
    the split per-substep; hoisting it flips the economics: the r5
    ablation roofline showed the HIGHEST-precision fetch was 66% of the
    whole RANS64 kernel).  The two adjacent-row candidates come from two
    int8 one-hot dots per plane -- 8 single-pass MXU tiles instead of the
    f32 path's 24 -- with exact int32 accumulation (one-hot x int8).
    int8 planes cost 4 B per stream cell (f32 planes at 16 B/cell pushed
    the 2^23-symbol headline shape past VMEM at ilp=2; bf16 planes and
    Precision.HIGH dots are both rejected by the Mosaic lowering, and
    sub-32-bit dynamic loads need the caller's 8-aligned window offset
    via pl.multiple_of).
    """
    a, b = _bp_candidates(win, row_rel, shape)
    va = jnp.take_along_axis(a, col, axis=1)
    vb = jnp.take_along_axis(b, col, axis=1)
    return jnp.where(rel == row_rel, va, vb)


def window_fetch_mono2_bp(win, row_rel, rels, cols, shape):
    """window_fetch_mono_bp for several (rel, col) index pairs sharing one
    candidate fetch (the BYTE variant's two refill bytes per symbol)."""
    a, b = _bp_candidates(win, row_rel, shape)
    outs = []
    for rel, col in zip(rels, cols):
        va = jnp.take_along_axis(a, col, axis=1)
        vb = jnp.take_along_axis(b, col, axis=1)
        outs.append(jnp.where(rel == row_rel, va, vb))
    return tuple(outs)


def _bp_candidates(win, row_rel, shape):
    """Candidate window rows ``row_rel`` and ``row_rel + 1`` from int8
    byte-plane slices.  Each one-hot x plane dot is exact in int32; the
    -128 plane bias is undone by one constant add (the one-hot sums to 1
    per row, so the bias contributes exactly 0x80 per byte field)."""
    R = shape[0]
    W = win[0].shape[0]
    iw = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    oh0 = (iw == row_rel).astype(jnp.int8)
    oh1 = (iw == row_rel + 1).astype(jnp.int8)

    def comb(oh):
        o = [jnp.dot(oh, p, preferred_element_type=jnp.int32) for p in win]
        return (o[0] + (o[1] << 8) + (o[2] << 16) + (o[3] << 24)
                + _as_i32(0x80808080))

    return comb(oh0), comb(oh1)


#: scratch bytes per stream int32 cell for the byte-plane window fetch
#: (4 int8 planes).  NOT double-buffered (Pallas scratch is per-kernel,
#: not pipelined), so ILP accounting weighs these bytes at half
#: (pick_ilp multiplies by 2*ilp).
BP_PLANE_BYTES_PER_CELL = 4

#: extra window rows the bp fetch loads beyond wmax_rows: the dynamic
#: window offset must be a multiple of 8 for sub-32-bit vector loads, so
#: kernels round it down and widen the span by 8.
BP_WINDOW_PAD_ROWS = 8


def fill_byte_planes(plane_refs, stream):
    """Write the four 8-bit fields of int32 ``stream`` (rows, 128) into
    four (rows, 128) int8 scratch refs, biased by -128 so 0..255 fits the
    signed dtype (window_fetch_mono_bp undoes the bias)."""
    plane_refs[0][:] = ((stream & 0xFF) - 128).astype(jnp.int8)
    plane_refs[1][:] = ((srl(stream, 8) & 0xFF) - 128).astype(jnp.int8)
    plane_refs[2][:] = ((srl(stream, 16) & 0xFF) - 128).astype(jnp.int8)
    plane_refs[3][:] = ((srl(stream, 24)) - 128).astype(jnp.int8)


def _mono_candidates(window, row_rel, W: int, shape):
    """The two per-sublane-row candidate window rows, via one-hot MXU dots."""
    R = shape[0]
    wlo = (window & 0xFFFF).astype(jnp.float32)
    whi = srl(window, 16).astype(jnp.float32)
    iw = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    oh0 = (iw == row_rel).astype(jnp.float32)
    oh1 = (iw == row_rel + 1).astype(jnp.float32)
    # HIGHEST precision: default MXU passes truncate inputs to bf16, which
    # destroys 16-bit cell values; the one-hot side alone would survive in
    # bf16, but Mosaic supports neither per-operand dot precision nor
    # mixed-dtype (bf16 x f32) dots (both raise at lowering -- r4), so
    # HIGHEST on both sides is the floor for this fetch.
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    a = dot(oh0, wlo).astype(jnp.int32) \
        | (dot(oh0, whi).astype(jnp.int32) << 16)
    b = dot(oh1, wlo).astype(jnp.int32) \
        | (dot(oh1, whi).astype(jnp.int32) << 16)
    return a, b


def exact_div(x, freq, freq_f32_rcp=None):
    """Exact unsigned q = x // freq for int32 lanes (uint32 bit patterns),
    valid whenever x < freq << 24 (all renormalized rANS encode states).

    fp32 estimate + one integer fixup round.  Error analysis: the fp32
    rounding of x is at most ulp(x) <= freq * 2**-? ... since
    x < freq * 2**24, ulp(x) <= x * 2**-24 < freq, so the initial quotient is
    off by at most 1 after flooring; a single compare-and-adjust in each
    direction restores exactness.  (The reference instead uses Alverson
    fixed-point reciprocals, rans_byte.h:229-242; fp32 divide is the
    VPU-native equivalent.)
    """
    # uint32 -> f32 (value-exactness not required; error is bounded above)
    xf = _u32_to_f32(x)
    ff = freq.astype(jnp.float32)
    q = (xf / ff).astype(jnp.int32)  # non-negative, < 2**24 so cast is safe
    r = x - q * freq                 # exact mod 2**32; true value in (-2f, 2f)
    # fixup with SIGNED compares (r is a small signed residual, never a large
    # unsigned value); two rounds cover the (-2f, 2f) range
    for _ in range(2):
        too_big = r >= freq
        q = jnp.where(too_big, q + 1, q)
        r = jnp.where(too_big, r - freq, r)
        neg = r < 0
        q = jnp.where(neg, q - 1, q)
        r = jnp.where(neg, r + freq, r)
    return q, r


def _u32_to_f32(x):
    """Convert int32 lanes holding uint32 bit patterns to their unsigned
    float value (approximately; callers tolerate fp32 rounding)."""
    neg = x < 0
    base = jnp.where(neg, x - I32_MIN, x).astype(jnp.float32)
    return jnp.where(neg, base + jnp.float32(2147483648.0), base)


def mul_u32_u64(a, b_hi, b_lo, d=None):
    """(a * (b_hi, b_lo) + d) mod 2^64 for a 32-bit unsigned a, a 64-bit
    (hi, lo) pair and an optional 32-bit unsigned addend d, exact
    16-bit-limb schoolbook.

    Every column accumulates at most 3 sixteen-bit parts plus a carry
    < 2^19 (d adds one more part: still < 2^19), so all intermediates stay
    exact in int32 (the same discipline as mulhi32).  Folding d here costs
    two in-column adds and replaces the caller's 64-bit add-with-carry
    (compare + select + two adds) -- the rans64 decode advance's
    ``+ (slot - cum)`` and the reciprocal encode's ``+ bias`` ride the
    product for free (r4; rans64.h:133, rans64.h:277 do the same fold in
    scalar u64).  Returns (hi, lo) int32 lanes of the low 64 bits.
    """
    a0 = a & 0xFFFF
    a1 = srl(a, 16)
    b0 = b_lo & 0xFFFF
    b1 = srl(b_lo, 16)
    b2 = b_hi & 0xFFFF
    b3 = srl(b_hi, 16)
    p00 = a0 * b0
    p01 = a0 * b1
    p02 = a0 * b2
    p10 = a1 * b0
    p11 = a1 * b1
    if d is not None:
        # p00 <= (2^16-1)^2 and d & 0xFFFF <= 2^16-1: sum < 2^32, exact
        p00 = p00 + (d & 0xFFFF)
    c0 = p00 & 0xFFFF
    s1 = srl(p00, 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    if d is not None:
        s1 = s1 + srl(d, 16)
    c1 = s1 & 0xFFFF
    s2 = srl(s1, 16) + srl(p01, 16) + srl(p10, 16) \
        + (p02 & 0xFFFF) + (p11 & 0xFFFF)
    c2 = s2 & 0xFFFF
    # top limb mod 2^16: carries + low halves of the column-3 products
    s3 = srl(s2, 16) + srl(p02, 16) + srl(p11, 16) \
        + a0 * b3 + a1 * b2  # full products fine: only low 16 bits kept
    return (c2 | (s3 << 16)), (c0 | (c1 << 16))


def mul_u32_u32_64(a, b, d=None):
    """(a * b + d) exact 64-bit product of two 32-bit unsigned lanes plus
    an optional addend d < 2^31, as an (hi, lo) int32 pair.

    The sb == 31 RANS64 decode advance: x < 2^63 makes y = x >> 31 a pure
    32-bit value (y_hi provably 0), so the general 32x64 schoolbook
    (mul_u32_u64, 7 partial products) collapses to 4.  Same 16-bit-limb
    carry discipline: every column sum < 2^18, exact in int32.
    """
    a0 = a & 0xFFFF
    a1 = srl(a, 16)
    b0 = b & 0xFFFF
    b1 = srl(b, 16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    if d is not None:
        p00 = p00 + (d & 0xFFFF)  # both < 2^32 jointly: p00 + d_lo < 2^32
    mid = srl(p00, 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    if d is not None:
        mid = mid + srl(d, 16)
    lo = (p00 & 0xFFFF) | (mid << 16)
    hi = a1 * b1 + srl(p01, 16) + srl(p10, 16) + srl(mid, 16)
    return hi, lo


def mulhi64(a_hi, a_lo, b_hi, b_lo):
    """High 64 bits of the exact 128-bit product of two unsigned 64-bit
    (hi, lo) int32-pair lanes -- the VPU emulation of Rans64MulHi
    (rans64.h:31-51, __umulh / unsigned __int128).

    Full 4x4 16-bit-limb schoolbook with column-wise carry propagation;
    every column sum stays < 2^20, exact in int32.
    """
    a = (a_lo & 0xFFFF, srl(a_lo, 16), a_hi & 0xFFFF, srl(a_hi, 16))
    b = (b_lo & 0xFFFF, srl(b_lo, 16), b_hi & 0xFFFF, srl(b_hi, 16))
    # columns 0..6 accumulated as (sum of 16-bit parts + carry); column 7
    # needs only its low 16 bits
    carry = None
    cols = []
    for k in range(7):
        s = carry if carry is not None else 0
        hi_parts = 0
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                p = a[i] * b[j]
                s = s + (p & 0xFFFF)
                hi_parts = hi_parts + srl(p, 16)
        cols.append(s & 0xFFFF)
        carry = srl(s, 16) + hi_parts
    c7 = carry
    for i in range(4):
        j = 7 - i
        if 0 <= j < 4:
            c7 = c7 + a[i] * b[j]  # only low 16 bits of column 7 survive
    return (cols[6] | (c7 << 16)), (cols[4] | (cols[5] << 16))


def add64(a_hi, a_lo, b_hi, b_lo):
    """(a + b) mod 2^64 on (hi, lo) int32-pair lanes."""
    s_lo = a_lo + b_lo
    carry = ugt(a_lo, s_lo).astype(jnp.int32)  # unsigned wrap detect
    return a_hi + b_hi + carry, s_lo


def srl64(a_hi, a_lo, n):
    """Logical right shift of a 64-bit (hi, lo) pair by a per-lane count
    n in [0, 31] (shifts by 32-n are decomposed to stay < 32)."""
    lo = srl(a_lo, n) | ((a_hi << 1) << (31 - n))
    hi = srl(a_hi, n)
    return hi, lo


def mulhi32(a, b):
    """High 32 bits of the unsigned 32x32 product, via 16-bit limbs.

    TPU VPU has no umulh; this is the emulation the SURVEY (§2.7) calls for.
    All intermediate products are 16x16 -> 32-bit, exact in int32.
    """
    al = a & 0xFFFF
    ah = srl(a, 16)
    bl = b & 0xFFFF
    bh = srl(b, 16)
    p_ll = al * bl
    p_lh = al * bh
    p_hl = ah * bl
    p_hh = ah * bh
    mid = srl(p_ll, 16) + (p_lh & 0xFFFF) + (p_hl & 0xFFFF)
    return p_hh + srl(p_lh, 16) + srl(p_hl, 16) + srl(mid, 16)
