"""Low-level lane-coder API tests: function-level parity with the
reference's header API, validated against the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ryg_rans_tpu.config import (BYTE_SPEC, RANS64_SPEC, WORD_SPEC,
                                 RansConfig, Variant)
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import coder
from ryg_rans_tpu.ops import reference_numpy as oracle


def _model(book1_head, sb):
    data = book1_head[:8192]
    freqs, cum = stats.build_model(data, sb)
    return data, freqs, cum


def test_enc_put_symbol_matches_slow_path(book1_head, rng):
    """Division-free reciprocal encode == slow division encode over random
    valid states, including freq=1 symbols (rans_byte.h:199-228)."""
    sb = 14
    data, freqs, cum = _model(book1_head, sb)
    # force some freq=1 symbols into the test set
    rare = np.where(freqs == 1)[0]
    spec = BYTE_SPEC
    esyms = coder.enc_symbol_init(freqs, cum, sb, spec)
    syms = np.concatenate([
        rng.choice(np.where(freqs > 0)[0], 1000),
        np.repeat(rare[:4], 8) if rare.size else np.empty(0, np.int64),
    ]).astype(np.int32)
    x = rng.integers(spec.L, 1 << 31, syms.size, dtype=np.uint64)
    xs = jnp.asarray(x.astype(np.uint32))
    x_fast, w_fast, k_fast = coder.enc_put_symbol(
        xs, jnp.asarray(syms), esyms, spec, sb)
    x_slow, w_slow, k_slow = coder.enc_put(
        xs, jnp.asarray(syms), freqs, cum, spec, sb)
    assert np.array_equal(np.asarray(x_fast), np.asarray(x_slow))
    assert np.array_equal(np.asarray(w_fast), np.asarray(w_slow))
    assert np.array_equal(np.asarray(k_fast), np.asarray(k_slow))


def test_enc_put_symbol_matches_slow_path_rans64(book1_head, rng):
    """64-bit reciprocal path (Rans64EncPutSymbol) == slow division."""
    with jax.enable_x64(True):
        sb = 14
        data, freqs, cum = _model(book1_head, sb)
        spec = RANS64_SPEC
        esyms = coder.enc_symbol_init(freqs, cum, sb, spec)
        syms = rng.choice(np.where(freqs > 0)[0], 1000).astype(np.int32)
        x = rng.integers(spec.L, 1 << 63, syms.size, dtype=np.uint64)
        xs = jnp.asarray(x)
        x_fast, w_fast, k_fast = coder.enc_put_symbol(
            xs, jnp.asarray(syms), esyms, spec, sb)
        x_slow, w_slow, k_slow = coder.enc_put(
            xs, jnp.asarray(syms), freqs, cum, spec, sb)
        assert np.array_equal(np.asarray(x_fast), np.asarray(x_slow))
        assert np.array_equal(np.asarray(w_fast), np.asarray(w_slow))
        assert np.array_equal(np.asarray(k_fast), np.asarray(k_slow))


def _coder_encode(data, freqs, cum, spec, sb, N):
    """Assemble a stream with the low-level ops (forward layout)."""
    T = data.size // N
    esyms = coder.enc_symbol_init(freqs, cum, sb, spec)
    x = coder.enc_init((N,), spec)
    per_step = []
    for t in reversed(range(T)):
        syms = jnp.asarray(data[t * N:(t + 1) * N].astype(np.int32))
        x, words, k = coder.enc_put_symbol(x, syms, esyms, spec, sb)
        per_step.append((np.asarray(words), np.asarray(k)))
    per_step.reverse()
    head = np.asarray(coder.enc_flush(x, spec)).reshape(-1)
    body = []
    for words, k in per_step:
        for lane in range(N):
            for r in range(spec.max_renorm - k[lane], spec.max_renorm):
                body.append(words[r, lane])
    return np.concatenate([head, np.array(body, head.dtype)])


def _coder_decode(stream, n_symbols, freqs, cum, spec, sb, N):
    T = n_symbols // N
    starts, fr = coder.dec_symbol_init(freqs, cum)
    c2s = jnp.asarray(stats.cum2sym(cum, sb).astype(np.int32))
    head = jnp.asarray(stream[:N * spec.state_words].reshape(
        N, spec.state_words))
    x = coder.dec_init(head, spec)
    sj = jnp.asarray(stream)
    base = jnp.int32(N * spec.state_words)
    out = np.zeros(n_symbols, np.uint8)
    for t in range(T):
        slot = coder.dec_get(x, sb)
        sym = c2s[slot]
        out[t * N:(t + 1) * N] = np.asarray(sym)
        x = coder.dec_advance_symbol_step(x, starts, fr, sym, sb)
        x, base = coder.dec_renorm(x, sj, base, spec)
    return out


@pytest.mark.parametrize("spec,variant,sb,N", [
    (BYTE_SPEC, Variant.BYTE, 14, 4),
    (WORD_SPEC, Variant.WORD, 12, 4),
])
def test_coder_stream_matches_oracle_and_roundtrips(book1_head, spec,
                                                    variant, sb, N):
    """A stream assembled from the low-level ops must equal the oracle's
    stream for the same lane config, and decode back via the Step/Renorm
    split (the interleave template, SURVEY.md §3.3)."""
    data, freqs, cum = _model(book1_head, sb)
    data = data[:64 * N]
    stream = _coder_encode(data, freqs, cum, spec, sb, N)

    cfg = RansConfig(variant=variant, prob_bits=sb, n_lanes=N,
                     lanes_per_stream=N, block_symbols=4 * N)
    ref = oracle.encode(cfg, data, freqs, cum)[0]
    assert np.array_equal(stream.astype(np.uint64), ref.astype(np.uint64))

    dec = _coder_decode(stream, data.size, freqs, cum, spec, sb, N)
    assert np.array_equal(dec, data)


def test_coder_rans64_roundtrip(book1_head):
    with jax.enable_x64(True):
        sb = 14
        data, freqs, cum = _model(book1_head, sb)
        data = data[:64 * 4]
        spec = RANS64_SPEC
        stream = _coder_encode(data, freqs, cum, spec, sb, 4)
        cfg = RansConfig(variant=Variant.RANS64, prob_bits=sb, n_lanes=4,
                         lanes_per_stream=4, block_symbols=16)
        ref = oracle.encode(cfg, data, freqs, cum)[0]
        assert np.array_equal(stream.astype(np.uint64),
                              ref.astype(np.uint64))
        dec = _coder_decode(stream, data.size, freqs, cum, spec, sb, 4)
        assert np.array_equal(dec, data)


def test_coder_ops_jit(book1_head):
    """The hot ops trace and compile under jax.jit."""
    sb = 14
    data, freqs, cum = _model(book1_head, sb)
    spec = BYTE_SPEC
    esyms = coder.enc_symbol_init(freqs, cum, sb, spec)

    @jax.jit
    def step(x, syms):
        return coder.enc_put_symbol(x, syms, esyms, spec, sb)

    x = coder.enc_init((8,), spec)
    x2, w, k = step(x, jnp.arange(8, dtype=jnp.int32))
    assert x2.shape == (8,)

    starts, fr = coder.dec_symbol_init(freqs, cum)

    @jax.jit
    def dstep(x, stream, base, syms):
        x = coder.dec_advance_symbol_step(x, starts, fr, syms, sb)
        return coder.dec_renorm(x, stream, base, spec)

    stream = jnp.zeros(64, jnp.uint8)
    x3, nb = dstep(x2, stream, jnp.int32(0), jnp.arange(8, dtype=jnp.int32))
    assert x3.shape == (8,)
