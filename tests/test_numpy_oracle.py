"""Round-trip tests of the NumPy oracle codec across all variants/layouts."""

import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import reference_numpy as oracle


def _roundtrip(cfg: RansConfig, data: np.ndarray):
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    streams = oracle.encode(cfg, data, freqs, cum)
    dec = oracle.decode(cfg, streams, data.size, freqs, cum)
    assert np.array_equal(dec, data), f"round-trip failed for {cfg}"
    return streams


VARIANTS = [Variant.BYTE, Variant.WORD, Variant.RANS64, Variant.ALIAS]


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("n_lanes", [1, 2, 8])
def test_roundtrip_reference_layouts(book1_head, variant, n_lanes):
    cfg = RansConfig.reference(variant, n_lanes=n_lanes)
    _roundtrip(cfg, book1_head[:8192])


@pytest.mark.parametrize("variant", VARIANTS)
def test_roundtrip_wide_lanes(book1_head, variant):
    cfg = RansConfig(
        variant=variant,
        prob_bits={Variant.WORD: 12, Variant.ALIAS: 16}.get(variant, 14),
        n_lanes=256,
        lanes_per_stream=128,
        block_symbols=65536,
    )
    _roundtrip(cfg, book1_head)


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("size", [0, 1, 2, 3, 127, 128, 129, 1023])
def test_roundtrip_tails(rng, variant, size):
    """Odd tails exercise the masked first-encoded/last-decoded step
    (main.cpp:233-236, 276-280)."""
    data = rng.integers(0, 256, size, dtype=np.uint8).astype(np.uint8)
    if size == 0:
        return  # empty input handled at API layer, not the core
    cfg = RansConfig(
        variant=variant,
        prob_bits={Variant.WORD: 12, Variant.ALIAS: 16}.get(variant, 14),
        n_lanes=8,
        lanes_per_stream=4,
        block_symbols=1024,
    )
    _roundtrip(cfg, data)


def test_roundtrip_skewed_distribution(rng):
    """Highly skewed data stresses renorm (freq-1 symbols + max-freq)."""
    data = np.concatenate([
        np.zeros(50000, np.uint8),
        rng.integers(0, 256, 300, dtype=np.uint8),
    ])
    rng.shuffle(data)
    for variant in VARIANTS:
        cfg = RansConfig(
            variant=variant,
            prob_bits={Variant.WORD: 12, Variant.ALIAS: 16}.get(variant, 14),
            n_lanes=32,
            lanes_per_stream=32,
            block_symbols=65536,
        )
        _roundtrip(cfg, data)


def test_single_symbol_alphabet():
    """Degenerate model: one symbol with full probability mass."""
    data = np.full(5000, 42, np.uint8)
    for variant in [Variant.BYTE, Variant.WORD, Variant.RANS64]:
        cfg = RansConfig(
            variant=variant,
            prob_bits={Variant.WORD: 12}.get(variant, 14),
            n_lanes=4,
            lanes_per_stream=4,
            block_symbols=8192,
        )
        _roundtrip(cfg, data)


def test_compressed_size_near_entropy(book1_head):
    """Order-0 sanity: payload within 1.5% of the empirical entropy bound."""
    freqs = stats.count_freqs(book1_head)
    p = freqs[freqs > 0] / book1_head.size
    entropy_bytes = float(-(p * np.log2(p)).sum() * book1_head.size / 8)
    cfg = RansConfig.reference(Variant.BYTE, n_lanes=2)
    streams = _roundtrip(cfg, book1_head)
    payload = oracle.roundtrip_payload_bytes(cfg, streams)
    assert payload < entropy_bytes * 1.015
