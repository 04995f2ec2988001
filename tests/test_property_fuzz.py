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


@settings(max_examples=25, deadline=None)
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


@pytest.mark.parametrize("variant,pb", [(v, m) for v, m in _VARIANTS])
def test_empty_input_all_backends(variant, pb):
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=256,
                     block_symbols=1024)
    blobs = [api.compress(b"", cfg, backend=be)
             for be in ("tpu", "native", "numpy")]
    assert blobs[0] == blobs[1] == blobs[2]
    assert api.decompress(blobs[0]) == b""
