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
    (M/512, 128) rows, plus a (4,128) per-symbol table:

      rows 0-1: ((freq-1) << 16) | cum   -- the advance's (freq, start);
                freq-1 keeps the field exact up to prob_bits 16 (freq can
                reach 2^16 in the degenerate one-symbol model); decoders
                add the 1 back.  Absent symbols are never produced by the
                slot lookup, so their freq-1 underflow clamp is harmless.
      rows 2-3: the bisect's search keys (lanes.cum2sym_bisect*).  For
                prob_bits <= 15 they are FUSED keys
                (cum[s+1] << sb) | (freq-1): ordering on the high bits is
                ordering on cum[s+1] (compare against
                (slot << sb) | (2^sb - 1)), and the last REJECTED probe is
                exactly entry[sym], which then carries the symbol's freq
                AND cum (cum[s] = cum[s+1] - freq) -- so the bisect path
                needs no separate fc gather (lanes.cum2sym_bisect_fused,
                r3).  At prob_bits 16 the fused form would need 33 bits,
                so keys stay plain full-width cum[s+1] and kernels fall
                back to the fc lookup.  Entries are parity-interleaved --
                key e at (e & 1, e >> 1) -- so every bisect step's
                candidate lands in ONE statically known row (strides >= 2
                probe odd entries, the final stride-1 step even ones):
                one gather per step instead of a two-row sweep.
    """
    c2s = stats_mod.cum2sym(cum_freqs, sb).astype(np.uint32)
    s4 = (c2s[0::4] | (c2s[1::4] << 8) | (c2s[2::4] << 16)
          | (c2s[3::4] << 24))
    sym4_rows = s4.view(np.int32).reshape(-1, 128)
    f = np.maximum(np.asarray(freqs, np.uint32), 1) - 1
    fc = (f << 16) | np.asarray(cum_freqs[:256], np.uint32)
    keys = np.asarray(cum_freqs[1:257], np.uint32)
    if sb <= 15:
        keys = (keys << sb) | f  # fused keys: 2*sb+1 <= 31 bits
    cn = keys.reshape(128, 2).T
    fc_rows = np.concatenate(
        [fc, cn.reshape(-1)]).view(np.int32).reshape(4, 128)
    return sym4_rows, fc_rows


def pack_slot_direct(freqs, cum_freqs, sb: int) -> np.ndarray:
    """One-level slot-direct decode table for prob_bits <= 12: entry[slot]
    packs sym:8 | freq-1:sb | (slot - cum[sym]):sb -- 8 + 2*sb <= 32 bits
    -- as (M/128, 128) int32.

    The decode advance needs (sym, freq, slot - cum); indexing by slot
    makes every field available in ONE table_lookup whose row gathers are
    all INDEPENDENT, trading the two-level sym4 path's dependent fc gather
    (slot -> sym -> (freq,cum)) for a wider fully-pipelined sweep -- the
    same dependent-vs-independent gather trade measured in docs/DESIGN.md
    (pb12 sweep vs bisect).  slot - cum[sym] is in [0, freq), so it
    substitutes directly into x = freq * (x >> sb) + off
    (rans_word_sse41.h:126) with no cum subtraction in-loop.
    """
    if not sb <= 12:
        raise ValueError("slot-direct table needs prob_bits <= 12")
    c2s = stats_mod.cum2sym(cum_freqs, sb).astype(np.uint32)
    f1 = (np.asarray(freqs, np.uint32)[c2s] - 1) & ((1 << sb) - 1)
    off = np.arange(1 << sb, dtype=np.uint32) - np.asarray(
        cum_freqs, np.uint32)[c2s]
    e = c2s | (f1 << 8) | (off << (8 + sb))
    return e.view(np.int32).reshape(-1, 128)


def pack_wide_fc(freqs, cum_freqs) -> np.ndarray:
    """Full-width decode symbol table for prob_bits > 16 (RANS64): (6,128)
    int32 with rows 0-1 = freq-1, rows 2-3 = cum, rows 4-5 = cum[s+1] (the
    bisect keys, parity-interleaved like pack_sym4_fc's) -- every field a
    full u32, since freq/cum exceed any 16-bit packed field beyond
    prob_bits 16 (rans64.h allows 31).

    The key rows are stored XOR-BIASED (key ^ 2^31): cum[s+1] reaches
    2^31 exactly at prob_bits 31, and pre-biasing lets the search run on
    plain signed compares with one probe-side xor per lookup
    (lanes.cum2sym_bisect_track) instead of two xors per level."""
    f = np.maximum(np.asarray(freqs, np.uint32), 1) - 1
    c = np.asarray(cum_freqs[:256], np.uint32)
    cn = (np.asarray(cum_freqs[1:257], np.uint32)
          ^ np.uint32(0x80000000)).reshape(128, 2).T
    return np.concatenate(
        [f, c, cn.reshape(-1)]).view(np.int32).reshape(6, 128)


def pack_enc_fc_minus1(freqs, cum_freqs) -> np.ndarray:
    """Per-symbol ((freq-1) << 16) | cum as (2,128) int32 (freq-1 so
    freq = 2^16 at prob_bits 16 still fits 16 bits)."""
    f = np.maximum(np.asarray(freqs, np.uint32), 1) - 1
    c = np.asarray(cum_freqs[:256], np.uint32)
    return ((f << 16) | c).view(np.int32).reshape(2, 128)


def default_interpret() -> bool:
    import jax
    return jax.default_backend() != "tpu"


#: Scoped-VMEM limit for the codec pallas_calls.  v5e has 128 MiB of VMEM;
#: 100 MiB leaves headroom for tables and the compiler's own scratch while
#: letting block_symbols reach 2^23 (the ratio-optimal shapes -- the flushed
#: lane-state head amortizes with block size, docs/DESIGN.md).
VMEM_LIMIT = 100 << 20

# Scoped-VMEM footprint is ~2x (pipeline double-buffering) x ilp x the
# per-block buffer bytes, so 2-block ILP must switch off for large blocks.
_ILP_BUDGET = 96 << 20


def pick_ilp(n_blocks: int, bytes_per_block: int,
             prefer: tuple = (2,)) -> int:
    """Block-ILP width (+25% decode at 2, docs/DESIGN.md) whose footprint
    still fits the scoped-VMEM budget.  ``prefer`` lists widths best-first:
    RANS64 decode passes (4, 3, 2) -- its long limb-arithmetic dependency
    chain keeps gaining (r4: 10.05 at ilp=4 vs 9.90 at 3, pb=14) -- and
    BYTE decode passes (3, 2) (0-4% across r4 probes, never worse);
    WORD and ALIAS measured neutral-to-worse beyond 2 (vreg pressure,
    r2 dead-end list; r4 re-checks)."""
    for c in prefer:
        if n_blocks % c == 0 and 2 * c * bytes_per_block <= _ILP_BUDGET:
            return c
    return 1


def split_blocks(cfg: RansConfig, padded_size: int):
    """(n_full_blocks, tail_symbols); all sizes multiples of 4*n_lanes."""
    B = cfg.block_symbols
    n_full = padded_size // B
    return n_full, padded_size - n_full * B


#: Blocks per front-door dispatch group (ops/*.encode/decode): the host
#: orchestration enqueues every group's transfer + kernel WITHOUT blocking
#: and fetches results afterwards, so group N+1's host->device transfer
#: overlaps group N's compute (the reference's demos time the whole
#: pipeline, main.cpp:169-186; r5 VERDICT #2).  4 keeps per-group kernels
#: at peak grid throughput (SCALING_r03: flat from 2 blocks up) while
#: bounding in-flight HBM. Fixed size -> compiled shapes reuse across
#: calls (the remainder group and tail compile their own shapes once).
PIPELINE_GROUP_BLOCKS = 4


def block_groups(n_full: int, group: int = PIPELINE_GROUP_BLOCKS):
    """Yield (start_block, n_blocks) fixed-size dispatch groups covering
    ``n_full`` full blocks (last group may be smaller)."""
    for g in range(0, n_full, group):
        yield g, min(group, n_full - g)
