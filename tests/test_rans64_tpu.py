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


# 17000 spans two full blocks -> exercises the encode kernel's ilp=2 path
@pytest.mark.parametrize("size", [2048, 9000,
                                  pytest.param(17000, marks=pytest.mark.slow)])
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


@pytest.mark.parametrize(
    "size", [2048, pytest.param(20000, marks=pytest.mark.slow)])
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


@pytest.mark.parametrize("pb", [
    16, 20, pytest.param(24, marks=pytest.mark.slow), 31])
def test_high_precision_encode_and_roundtrip(book1_head, pb):
    """The reference's defining RANS64 feature: prob_bits up to 31
    (rans64.h:169).  pb > 16 exercises two-limb frequencies on decode and
    the 64-bit Alverson reciprocal on encode; streams must be byte-exact
    vs the oracle."""
    cfg = _cfg(block_symbols=4096, prob_bits=pb)
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, pb)
    blocks, padded_size = rans64_tpu.encode(cfg, data, freqs, cum,
                                            interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = rans64_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                            interpret=True)
    assert np.array_equal(dec[:data.size], data)


@pytest.mark.parametrize("pb", [31])
def test_high_precision_skewed_model(rng, pb):
    """freq=1 symbols at prob_bits 31: reciprocal freq<2 special case
    (rcp=~0, bias=start+M-1, rans64.h:199-228) and 31-bit cum values."""
    cfg = _cfg(block_symbols=4096, prob_bits=pb)
    data = np.zeros(4096, np.uint8)
    ridx = rng.integers(0, data.size, 200)
    data[ridx] = rng.integers(1, 256, 200).astype(np.uint8)
    freqs, cum = stats.build_model(data, pb)
    blocks, padded_size = rans64_tpu.encode(cfg, data, freqs, cum,
                                            interpret=True)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = rans64_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                            interpret=True)
    assert np.array_equal(dec[:data.size], data)


@pytest.mark.slow
def test_recip_matches_div_encode(book1_head):
    """At low prob_bits both encode paths must produce identical streams
    (VERDICT r1 #7 A/B: reciprocal vs fp32 exact_div)."""
    import jax.numpy as jnp
    from ryg_rans_tpu.ops import word_tpu

    pb, R, T4 = 14, 1, 8
    data = book1_head[:4 * T4 * 128]
    freqs, cum = stats.build_model(data, pb)
    spk = word_tpu.pack_symbols(jnp.asarray(data), T4, R, 1)
    fc_div = jnp.asarray(rans64_tpu.pack_enc_tables(freqs, cum))
    fc_rcp = jnp.asarray(rans64_tpu.pack_enc_tables_recip(freqs, cum, pb))
    a = rans64_tpu.encode_blocks(fc_div, spk, T4=T4, R=R, sb=pb, n_blocks=1,
                                 interpret=True, recip=False)
    b = rans64_tpu.encode_blocks(fc_rcp, spk, T4=T4, R=R, sb=pb, n_blocks=1,
                                 interpret=True, recip=True)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
