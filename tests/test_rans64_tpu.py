"""TPU RANS64-variant kernel tests (Pallas interpret mode on CPU; the same
code path compiles on real TPU)."""

import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import rans64_tpu
from ryg_rans_tpu.ops import reference_numpy as oracle


def _cfg(n_lanes=128, block_symbols=1 << 13, prob_bits=14):
    return RansConfig(variant=Variant.RANS64, prob_bits=prob_bits,
                      n_lanes=n_lanes, lanes_per_stream=n_lanes,
                      block_symbols=block_symbols)


@pytest.mark.parametrize("size", [2048, 9000])
def test_tpu_encode_matches_oracle(book1_head, size):
    cfg = _cfg()
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    from ryg_rans_tpu.ops import word_tpu
    padded, _ = word_tpu.pad_block(data, cfg.n_lanes, freqs)

    blocks, padded_size = rans64_tpu.encode(cfg, data, freqs, cum,
                                            interpret=True)
    assert padded_size == padded.size
    B = cfg.block_symbols
    off = 0
    for blk in blocks:
        chunk = padded[off:off + B]
        ref = oracle.encode(cfg, chunk, freqs, cum)[0]
        assert blk.size == ref.size
        assert np.array_equal(blk, ref)
        off += chunk.size


@pytest.mark.parametrize("size", [2048, 20000])
def test_tpu_decode_roundtrip(book1_head, size):
    cfg = _cfg()
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    blocks, padded_size = rans64_tpu.encode(cfg, data, freqs, cum,
                                            interpret=True)
    dec = rans64_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                            interpret=True)
    assert np.array_equal(dec[:size], data)


def test_tpu_decodes_oracle_stream(book1_head):
    cfg = _cfg(prob_bits=15)  # max TPU-path precision
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    from ryg_rans_tpu.ops import word_tpu
    padded, orig = word_tpu.pad_block(data, cfg.n_lanes, freqs)
    streams = oracle.encode(cfg, padded, freqs, cum)
    dec = rans64_tpu.decode(cfg, [streams[0]], padded.size, freqs, cum,
                            interpret=True)
    assert np.array_equal(dec[:orig], data)


def test_skewed_model_roundtrip(rng):
    """freq=1 symbols + a dominant symbol stress the limb arithmetic."""
    cfg = _cfg(block_symbols=4096, prob_bits=15)
    data = np.zeros(4096, np.uint8)
    ridx = rng.integers(0, data.size, 200)
    data[ridx] = rng.integers(1, 256, 200).astype(np.uint8)
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    blocks, padded_size = rans64_tpu.encode(cfg, data, freqs, cum,
                                            interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = rans64_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                            interpret=True)
    assert np.array_equal(dec[:data.size], data)
