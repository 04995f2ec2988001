"""TPU word-variant kernel tests (run in Pallas interpret mode on the CPU
backend; the same code path compiles on real TPU)."""

import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import reference_numpy as oracle
from ryg_rans_tpu.ops import word_tpu


def _cfg(n_lanes=128, block_symbols=1 << 13):
    return RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=n_lanes,
                      lanes_per_stream=n_lanes, block_symbols=block_symbols)


# 17000 spans two full blocks -> exercises the encode kernel's ilp=2 path
@pytest.mark.parametrize("size", [2048, 9000, 17000])
def test_tpu_encode_matches_oracle(book1_head, size):
    """The Pallas encoder must produce the oracle's exact stream for the
    same (padded) block."""
    cfg = _cfg()
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    padded, _ = word_tpu.pad_block(data, cfg.n_lanes, freqs)

    blocks, padded_size = word_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    assert padded_size == padded.size

    # oracle encodes each block independently with the same model
    B = cfg.block_symbols
    off = 0
    for blk in blocks:
        chunk = padded[off:off + B]
        ref = oracle.encode(cfg, chunk, freqs, cum)[0]
        assert blk.size == ref.size
        assert np.array_equal(blk, ref)
        off += chunk.size


@pytest.mark.parametrize("size", [2048, 9000,
                                  pytest.param(20000, marks=pytest.mark.slow)])
def test_tpu_decode_roundtrip(book1_head, size):
    """Multi-block round-trip including a short tail block."""
    cfg = _cfg()
    data = book1_head[:size]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    blocks, padded_size = word_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    dec = word_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:size], data)


def test_tpu_decodes_oracle_stream(book1_head):
    """Format interop: the Pallas decoder consumes an oracle-encoded
    stream."""
    cfg = _cfg()
    data = book1_head[:4096]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    padded, orig = word_tpu.pad_block(data, cfg.n_lanes, freqs)
    streams = oracle.encode(cfg, padded, freqs, cum)
    dec = word_tpu.decode(cfg, [streams[0]], padded.size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:orig], data)


def test_pack_unpack_symbols_roundtrip(rng):
    data = rng.integers(0, 256, 4 * 2 * 128 * 3 * 2, dtype=np.uint8)
    import jax.numpy as jnp
    spk = word_tpu.pack_symbols(jnp.asarray(data), 3, 2, n_blocks=2)
    back = np.asarray(word_tpu.unpack_symbols(spk, 3, 2, n_blocks=2))
    assert np.array_equal(back, data)


def test_exact_div_stress(rng):
    """exact_div must reproduce integer division on the encode domain
    x < freq << 20 including the uint32 upper half."""
    import jax.numpy as jnp
    from ryg_rans_tpu.ops import lanes
    freqs = rng.integers(1, 4097, 1024).astype(np.int64)
    xs = (rng.integers(0, freqs << 20, 1024)).astype(np.uint64)
    # include extremes
    freqs[0], xs[0] = 4096, (4096 << 20) - 1
    freqs[1], xs[1] = 1, (1 << 20) - 1
    freqs[2], xs[2] = 4095, (4095 << 20) - 1
    x_i32 = jnp.asarray(xs.astype(np.uint32).view(np.int32).reshape(8, 128))
    f_i32 = jnp.asarray(freqs.astype(np.int32).reshape(8, 128))
    q, r = lanes.exact_div(x_i32, f_i32)
    q = np.asarray(q).reshape(-1).astype(np.uint32)
    r = np.asarray(r).reshape(-1).astype(np.uint32)
    assert np.array_equal(q, (xs // freqs.astype(np.uint64)).astype(np.uint32))
    assert np.array_equal(r, (xs % freqs.astype(np.uint64)).astype(np.uint32))


def test_mulhi32(rng):
    import jax.numpy as jnp
    from ryg_rans_tpu.ops import lanes
    a = rng.integers(0, 1 << 32, 1024, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, 1024, dtype=np.uint64)
    hi = ((a * b) >> np.uint64(32)).astype(np.uint32)
    ai = jnp.asarray(a.astype(np.uint32).view(np.int32).reshape(8, 128))
    bi = jnp.asarray(b.astype(np.uint32).view(np.int32).reshape(8, 128))
    got = np.asarray(lanes.mulhi32(ai, bi)).reshape(-1).astype(np.uint32)
    assert np.array_equal(got, hi)


@pytest.mark.parametrize("pb", [
    pytest.param(14, marks=pytest.mark.slow), 15])
def test_word_high_precision_roundtrip(book1_head, pb):
    """prob_bits beyond the reference's fixed 12 (bisect lookup path)."""
    cfg = RansConfig(variant=Variant.WORD, prob_bits=pb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = book1_head[:8192]
    freqs, cum = stats.build_model(data, pb)
    blocks, padded_size = word_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    ref = oracle.encode(cfg, data[:4096], freqs, cum)[0]
    assert np.array_equal(blocks[0], ref)
    dec = word_tpu.decode(cfg, blocks, padded_size, freqs, cum,
                          interpret=True)
    assert np.array_equal(dec[:data.size], data)


@pytest.mark.parametrize("pb", [
    pytest.param(11, marks=pytest.mark.slow), 12])
def test_word_slot_direct_roundtrip(book1_head, pb):
    """A/B slot-direct decode (host_prep.pack_slot_direct): one-level
    sym|freq-1|off per-slot table, must reproduce the two-level path."""
    import jax.numpy as jnp

    from ryg_rans_tpu.ops import host_prep

    cfg = RansConfig(variant=Variant.WORD, prob_bits=pb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = book1_head[:8192]
    freqs, cum = stats.build_model(data, pb)
    blocks, padded_size = word_tpu.encode(cfg, data, freqs, cum,
                                          interpret=True)
    R, N = 1, 128
    T4 = 4096 // N // 4
    sd = jnp.asarray(host_prep.pack_slot_direct(freqs, cum, pb))
    _, fc = word_tpu.pack_dec_rows2(freqs, cum, pb)
    max_words = max(b.size for b in blocks)
    cap = word_tpu.decode_cap_rows(max_words, R)
    buf = np.zeros((2, max_words), np.int32)
    for i, b in enumerate(blocks):
        buf[i, :b.size] = b.astype(np.int32)
    x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, 2)
    spk = word_tpu.decode_blocks(sd, jnp.asarray(fc), x0, st, T4=T4, R=R,
                                 sb=pb, cap_rows=cap, n_blocks=2,
                                 interpret=True, slot_direct=True)
    dec = np.asarray(word_tpu.unpack_symbols(spk, T4, R, 2))
    assert np.array_equal(dec, data)
