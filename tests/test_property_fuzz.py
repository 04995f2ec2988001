"""Randomized-shape cross-backend property fuzz (VERDICT r2 task 8).

The fixed-shape suite pins (variant, prob_bits, n_lanes, block_symbols)
per test; layout-boundary bugs (tail blocks, cap_rows rounding, padding
edges) live exactly in the shapes nobody picked.  This draws configs and
sizes within the kernel constraints (api._tpu_supported's rules) and
asserts the framework's central invariant (docs/FORMAT.md): all three
backends -- Pallas-interpret, C++ native, NumPy oracle -- produce
byte-identical containers and exact round-trips.

The reference's analog is its per-demo memcmp self-check (main.cpp:211-214)
at its one hard-coded shape; here the shape is adversarial.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ryg_rans_tpu import api
from ryg_rans_tpu.config import RansConfig, Variant

# (variant, max prob_bits the slowest backend exercises here).  RANS64 goes
# past 16 to cover the two-limb frequency / wide-table path.
_VARIANTS = [(Variant.BYTE, 16), (Variant.WORD, 15),
             (Variant.ALIAS, 16), (Variant.RANS64, 18)]


@st.composite
def cases(draw):
    variant, maxpb = draw(st.sampled_from(_VARIANTS))
    pb = draw(st.integers(9, maxpb))
    n_lanes = draw(st.sampled_from([128, 256, 512]))
    blk_mult = draw(st.integers(1, 3))
    block_symbols = blk_mult * 4 * n_lanes
    # up to ~3 blocks; +-1 around block/padding boundaries is where the
    # cap_rows / tail logic lives
    boundary = draw(st.sampled_from(
        [1, n_lanes - 1, n_lanes, block_symbols - 1, block_symbols,
         block_symbols + 1, 2 * block_symbols + 17, 3 * block_symbols]))
    size = min(boundary + draw(st.integers(0, 64)), 3 * block_symbols)
    alphabet = draw(st.sampled_from([1, 2, 17, 256]))
    seed = draw(st.integers(0, 2**31 - 1))
    return variant, pb, n_lanes, block_symbols, size, alphabet, seed


@settings(max_examples=6, deadline=None)  # r5: 25 -> 10 for suite wall time;
# the slow lane's other hypothesis tests keep the deeper sweeps
@given(cases())
def test_cross_backend_container_equality(case):
    variant, pb, n_lanes, block_symbols, size, alphabet, seed = case
    rng = np.random.default_rng(seed)
    # zipf-ish skew exercises both dense and sparse frequency tables
    raw = rng.zipf(1.3, size=size) if alphabet == 256 else rng.integers(
        0, alphabet, size=size)
    data = (raw % alphabet).astype(np.uint8).tobytes()

    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=n_lanes,
                     block_symbols=block_symbols)
    blobs = {be: api.compress(data, cfg, backend=be)
             for be in ("tpu", "native", "numpy")}
    assert blobs["tpu"] == blobs["native"] == blobs["numpy"], (
        f"container mismatch at {case}: sizes "
        f"{ {be: len(b) for be, b in blobs.items()} }")
    for be in ("tpu", "native", "numpy"):
        assert api.decompress(blobs["tpu"], backend=be) == data, (
            f"round-trip mismatch on {be} at {case}")


@st.composite
def slot_direct_cases(draw):
    pb = draw(st.integers(9, 12))       # slot-direct window
    R = draw(st.sampled_from([1, 2]))   # interpret mode: small rows ok
    n_blocks = draw(st.integers(1, 3))
    t4 = draw(st.integers(1, 3))
    alphabet = draw(st.sampled_from([2, 17, 256]))
    seed = draw(st.integers(0, 2**31 - 1))
    return pb, R, n_blocks, t4, alphabet, seed


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(slot_direct_cases())
def test_word_slot_direct_matches_bisect_path(case):
    """The r3 A/B hooks must stay correct while unmeasured (VERDICT r3
    task 8): random shapes/data through WORD decode with slot_direct=True
    must equal both the default path's output and the input."""
    import jax.numpy as jnp

    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import host_prep, word_tpu

    pb, R, n_blocks, t4, alphabet, seed = case
    N = R * 128
    block_symbols = 4 * t4 * N
    size = n_blocks * block_symbols
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, size=size).astype(np.uint8)

    cfg = RansConfig(variant=Variant.WORD, prob_bits=pb, n_lanes=N,
                     lanes_per_stream=N, block_symbols=block_symbols)
    freqs, cum = stats.build_model(data, pb)
    blocks, _ = word_tpu.encode(cfg, data, freqs, cum, interpret=True)

    sd = jnp.asarray(host_prep.pack_slot_direct(freqs, cum, pb))
    s4, fc = word_tpu.pack_dec_rows2(freqs, cum, pb)
    cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
    buf = np.zeros((n_blocks, max(b.size for b in blocks)), np.int32)
    for i, b in enumerate(blocks):
        buf[i, :b.size] = b.astype(np.int32)
    x0, st_rows = word_tpu.prep_decode(jnp.asarray(buf), R, cap, n_blocks)

    out_sd = word_tpu.decode_blocks(
        sd, jnp.asarray(fc), x0, st_rows, T4=t4, R=R, sb=pb, cap_rows=cap,
        n_blocks=n_blocks, interpret=True, slot_direct=True)
    out_std = word_tpu.decode_blocks(
        jnp.asarray(s4), jnp.asarray(fc), x0, st_rows, T4=t4, R=R, sb=pb,
        cap_rows=cap, n_blocks=n_blocks, interpret=True)
    dec_sd = np.asarray(word_tpu.unpack_symbols(out_sd, t4, R, n_blocks))
    dec_std = np.asarray(word_tpu.unpack_symbols(out_std, t4, R, n_blocks))
    assert np.array_equal(dec_sd, dec_std)
    assert np.array_equal(dec_sd, data)


@pytest.mark.parametrize("variant,pb", [(v, m) for v, m in _VARIANTS])
def test_empty_input_all_backends(variant, pb):
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=256,
                     block_symbols=1024)
    blobs = [api.compress(b"", cfg, backend=be)
             for be in ("tpu", "native", "numpy")]
    assert blobs[0] == blobs[1] == blobs[2]
    assert api.decompress(blobs[0]) == b""
