"""Property test for the fused bisect symbol search (lanes.cum2sym_bisect_fused).

The fused path packs the parity-interleaved search keys as
(cum[s+1] << prob_bits) | (freq-1) (host_prep.pack_sym4_fc rows 2-3,
prob_bits <= 15) and recovers (sym, freq, cum[sym]) from the search's last
rejected probe with NO fc-table gather.  This pins the invariant directly:
for EVERY slot in [0, 2^prob_bits) and adversarial models (absent symbols,
freq-1 runs, single-dominant symbol), the fused search must agree with the
plain bisect + fc lookup, which is itself golden-verified via the kernel
round-trips (rans_byte.h:125-149 semantics).
"""

import numpy as np
import pytest

from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import host_prep, lanes


def _random_model(rng, sb, style):
    M = 1 << sb
    if style == "uniformish":
        w = rng.random(256) + 1e-3
    elif style == "sparse":  # most symbols absent
        w = np.zeros(256)
        present = rng.choice(256, size=rng.integers(2, 17), replace=False)
        w[present] = rng.random(present.size) + 1e-3
    elif style == "dominant":  # one symbol takes nearly all mass
        w = rng.random(256) * 1e-4
        w[rng.integers(0, 256)] = 1.0
    else:  # book1-like zipf
        w = 1.0 / (1.0 + np.argsort(rng.permutation(256)))
    # synthesize counts then exact-normalize like the real model path
    counts = np.maximum((w / w.sum() * (1 << 20)).astype(np.uint64), 0)
    freqs, cum = stats.normalize_freqs(counts, M)
    return np.asarray(freqs, np.uint32), np.asarray(cum, np.uint32)


@pytest.mark.parametrize("sb", [14, 15])
@pytest.mark.parametrize("style", ["uniformish", "sparse", "dominant",
                                   "zipf"])
def test_fused_bisect_matches_plain_plus_fc(sb, style):
    import jax.numpy as jnp

    # deterministic seed (hash() is salted per process -> irreproducible)
    styles = ["uniformish", "sparse", "dominant", "zipf"]
    rng = np.random.default_rng(sb * 1000 + styles.index(style))
    freqs, cum = _random_model(rng, sb, style)
    _, fc_rows = host_prep.pack_sym4_fc(freqs, cum, sb)
    fc = jnp.asarray(fc_rows)

    M = 1 << sb
    R = M // 128
    shape = (R, 128)
    slot = jnp.arange(M, dtype=jnp.int32).reshape(shape)

    sym_f, freq_f, cum_f = lanes.cum2sym_bisect_fused(fc[2:4], slot, sb,
                                                      shape)

    # ground truth from the model itself (searchsorted on cum)
    slots_np = np.arange(M)
    sym_t = np.searchsorted(cum[1:257], slots_np, side="right")
    freq_t = freqs[sym_t]
    cum_t = cum[sym_t]

    assert np.array_equal(np.asarray(sym_f).ravel(), sym_t)
    assert np.array_equal(np.asarray(freq_f).ravel(), freq_t)
    assert np.array_equal(np.asarray(cum_f).ravel(), cum_t)

    # hoist4 variant (stride-16 level as hoisted constants + select tree)
    c4 = lanes.bisect_consts(fc[2:4], shape, fused=True, levels=4)
    sym_4, freq_4, cum_4 = lanes.cum2sym_bisect_fused(fc[2:4], slot, sb,
                                                      shape, consts=c4)
    assert np.array_equal(np.asarray(sym_4).ravel(), sym_t)
    assert np.array_equal(np.asarray(freq_4).ravel(), freq_t)
    assert np.array_equal(np.asarray(cum_4).ravel(), cum_t)


@pytest.mark.parametrize("sb", [20, 31])
@pytest.mark.parametrize("style", ["sparse", "dominant"])
def test_track_bisect_wide_tables(sb, style):
    """cum2sym_bisect_track over full-width keys (RANS64 wide path): the
    last rejected probe must equal cum[sym+1] for every sampled slot --
    including the all-accept path (entry-255 init) and absent-symbol runs.
    Slots are sampled (2^sb is too many to enumerate): all cum boundaries
    +-1 plus random fill."""
    import jax.numpy as jnp

    from ryg_rans_tpu.ops.host_prep import pack_wide_fc

    rng = np.random.default_rng(sb + (0 if style == "sparse" else 99))
    M = 1 << sb
    if style == "sparse":
        w = np.zeros(256)
        present = rng.choice(256, size=rng.integers(2, 17), replace=False)
        w[present] = rng.random(present.size) + 1e-3
    else:
        w = rng.random(256) * 1e-6
        w[rng.integers(0, 256)] = 1.0
    counts = np.maximum((w / w.sum() * (1 << 22)).astype(np.uint64), 0)
    freqs, cum = stats.normalize_freqs(counts, M)
    freqs = np.asarray(freqs, np.uint64)
    cum = np.asarray(cum, np.uint64)
    fc = jnp.asarray(pack_wide_fc(freqs, cum))

    edges = np.unique(np.clip(np.concatenate(
        [cum[1:257] - 1, cum[1:257], cum[1:257] + 1,
         rng.integers(0, M, 2000).astype(np.uint64)]), 0, M - 1))
    n = 128 * 128
    slots = np.zeros(n, np.uint64)
    slots[:edges.size] = edges[:n]
    slots[edges.size:] = rng.integers(0, M, max(0, n - edges.size))
    shape = (128, 128)
    slot = jnp.asarray(slots.astype(np.int64).astype(np.int32)).reshape(
        shape)

    sym, cn = lanes.cum2sym_bisect_track(fc[4:6], slot, shape)

    sym_t = np.searchsorted(cum[1:257], slots, side="right")
    assert np.array_equal(np.asarray(sym).ravel(), sym_t)
    cn_t = cum[1:257][sym_t].astype(np.int64).astype(np.uint32)
    assert np.array_equal(np.asarray(cn).ravel().view(np.uint32), cn_t)

    # hoist4 variant over the pre-biased wide keys
    c4 = lanes.bisect_consts(fc[4:6], shape, fused=True, levels=4)
    sym_4, cn_4 = lanes.cum2sym_bisect_track(fc[4:6], slot, shape,
                                             consts=c4)
    assert np.array_equal(np.asarray(sym_4).ravel(), sym_t)
    assert np.array_equal(np.asarray(cn_4).ravel().view(np.uint32), cn_t)


def test_pb16_keys_stay_plain_full_width():
    """At prob_bits 16 the fused form would need 33 bits, and the tempting
    (cum[s+1]-1) << 16 bias UNDERFLOWS for leading absent symbols
    (cum[s+1] = 0 must accept every slot, but wraps to the never-accepted
    0xFFFF....) -- so pack_sym4_fc must emit plain cum[s+1] keys and the
    kernels keep the separate fc lookup there."""
    rng = np.random.default_rng(7)
    freqs, cum = _random_model(rng, 16, "uniformish")
    _, fc_rows = host_prep.pack_sym4_fc(freqs, cum, 16)
    # row layout: key e at (e & 1, e >> 1) -> reconstruct order
    cn = np.empty(256, np.uint32)
    cn[0::2] = fc_rows[2].view(np.uint32)
    cn[1::2] = fc_rows[3].view(np.uint32)
    assert np.array_equal(cn, cum[1:257])

    # the plain (non-fused) bisect over those keys stays exact at pb16,
    # with and without the hoisted stride-16 level
    import jax.numpy as jnp

    fc = jnp.asarray(fc_rows)
    shape = (128, 128)
    # all cum boundaries +-1 first, then strided fill over [0, 2^16)
    edges = np.unique(np.clip(np.concatenate(
        [cum[1:257].astype(np.int64) - 1, cum[1:257], cum[1:257] + 1]),
        0, (1 << 16) - 1)).astype(np.int64)
    slots_np = np.arange(0, 1 << 16, 4, dtype=np.int64)
    slots_np[:edges.size] = edges
    slot = jnp.asarray(slots_np.astype(np.int32)).reshape(shape)
    sym_t = np.searchsorted(cum[1:257], slots_np, side="right")
    sym = lanes.cum2sym_bisect(fc[2:4], slot, shape)
    assert np.array_equal(np.asarray(sym).ravel(), sym_t)
    c4 = lanes.bisect_consts(fc[2:4], shape, levels=4)
    sym_4 = lanes.cum2sym_bisect(fc[2:4], slot, shape, consts=c4)
    assert np.array_equal(np.asarray(sym_4).ravel(), sym_t)
