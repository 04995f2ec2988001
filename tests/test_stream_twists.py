"""Stream twist #3 (rans_byte.h:28-35): raw bytes spliced into a coded
stream with NO signaling, and models switched on the fly -- the reference
documents both as properties of its pointer-passing API; here the
composable coder (ops/coder.py) realizes them at the byte-stream level.

The encoder is a stack (rans_byte.h:22-26): later-decoded content is
encoded FIRST, and each phase's renorm words are laid down in reverse
step order; the decoder then consumes head -> phase A -> raw -> phase B
forward with one shared cursor, switching (start, freq) tables mid-stream
exactly like the reference's per-call RansEncPutSymbol arguments.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import coder


def _encode_phase(x, syms, freqs, cum, spec, sb):
    """Encode one phase (reverse symbol order, single lane); returns
    (x, words in DECODE order)."""
    step_words = []
    fj = jnp.asarray(freqs)
    cj = jnp.asarray(cum)
    for s in reversed(syms.tolist()):
        x, w, k = coder.enc_put(x, jnp.asarray([s]), fj, cj, spec, sb)
        kk = int(k[0])
        # w rows are most-significant-first; the fired rounds are the
        # LAST kk rows of the stack (enc_renorm collects round 0 first,
        # then reverses)
        step_words.append([int(w[r, 0]) for r in range(w.shape[0] - kk,
                                                       w.shape[0])])
    # first-encoded symbol decodes LAST -> reverse the step order
    out = []
    for ws in reversed(step_words):
        out.extend(ws)
    return x, out


def _decode_phase(x, stream, base, n, freqs, cum, spec, sb):
    """Decode n symbols (single lane) with the given model; returns
    (x, base, symbols)."""
    c2s = stats.cum2sym(np.asarray(cum, np.uint32), sb)
    starts = jnp.asarray(cum[:256], jnp.uint32)
    fj = jnp.asarray(freqs, jnp.uint32)
    out = []
    for _ in range(n):
        slot = int(coder.dec_get(x, sb)[0])
        s = int(c2s[slot])
        out.append(s)
        x, base = coder.dec_advance(x, stream, base,
                                    starts[jnp.asarray([s])],
                                    fj[jnp.asarray([s])], spec, sb)
    return x, base, np.array(out, np.uint8)


def test_midstream_raw_bytes_and_model_switch(book1_head):
    sb = 14
    spec = RansConfig(variant=Variant.BYTE, prob_bits=sb).spec
    rng = np.random.default_rng(42)

    phase_a = book1_head[:96]                       # text, model A
    raw = rng.integers(0, 256, 37, dtype=np.uint8)  # spliced verbatim
    phase_b = rng.integers(0, 8, 96, dtype=np.uint8)  # different stats, B

    freqs_a, cum_a = stats.build_model(phase_a, sb)
    freqs_b, cum_b = stats.build_model(phase_b, sb)

    # --- encode (LIFO: phase B first, then raw, then phase A) ----------
    x = coder.enc_init((1,), spec)
    x, words_b = _encode_phase(x, phase_b, freqs_b, cum_b, spec, sb)
    x, words_a = _encode_phase(x, phase_a, freqs_a, cum_a, spec, sb)
    head = np.asarray(coder.enc_flush(x, spec)).reshape(1, -1)

    # decoder-forward stream: [phase A words][raw bytes][phase B words];
    # the raw splice carries NO marker -- lengths travel out-of-band,
    # exactly the reference's contract (rans_byte.h:28-35)
    stream = jnp.asarray(np.array(words_a + raw.tolist() + words_b,
                                  np.uint32))

    # --- decode forward with one shared cursor --------------------------
    x = coder.dec_init(jnp.asarray(head), spec)
    base = jnp.int32(0)
    x, base, dec_a = _decode_phase(x, stream, base, phase_a.size,
                                   freqs_a, cum_a, spec, sb)
    assert np.array_equal(dec_a, phase_a)

    # raw bytes read verbatim at the cursor (coder state untouched)
    b0 = int(base)
    dec_raw = np.asarray(stream[b0:b0 + raw.size], np.uint32)
    assert np.array_equal(dec_raw.astype(np.uint8), raw)
    base = base + raw.size

    # model switch: same coder state, new (start, freq) tables
    x, base, dec_b = _decode_phase(x, stream, base, phase_b.size,
                                   freqs_b, cum_b, spec, sb)
    assert np.array_equal(dec_b, phase_b)
    assert int(base) == int(stream.size)  # every word consumed, in order
