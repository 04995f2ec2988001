"""Container v2 metadata diet (VERDICT r2 task 7): packed prob_bits-wide
freqs + varint counts, with v1 containers still readable.

The reference carries its model out-of-band (SURVEY.md §5 "checkpoint:
absent"), so every container byte here is overhead it doesn't pay; v2
shrinks that overhead from ~1.6 KiB to ~0.4 KiB on a 2-block book1-class
container.
"""

import io

import numpy as np
import pytest

from ryg_rans_tpu import api
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.utils import container as cont


def _payloads(cfg, data):
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    return freqs, api._encode_payloads(
        cfg, "native", api._pad(data, cfg, freqs), freqs, cum)


@pytest.mark.parametrize("variant,pb", [
    (Variant.WORD, 12), (Variant.BYTE, 14), (Variant.ALIAS, 16),
    (Variant.RANS64, 14),
    pytest.param(Variant.RANS64, 31, marks=pytest.mark.slow)])
def test_v1_v2_same_contents(variant, pb, book1_head):
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    v1 = cont.pack(cfg, book1_head.size, freqs, payloads, version=1)
    v2 = cont.pack(cfg, book1_head.size, freqs, payloads, version=2)
    assert len(v2) < len(v1)
    c1, c2 = cont.unpack(v1), cont.unpack(v2)
    assert np.array_equal(c1.freqs, c2.freqs)
    assert np.array_equal(c1.stream_words, c2.stream_words)
    assert c1.orig_len == c2.orig_len and c1.cfg == c2.cfg
    # payload bytes are identical; only the metadata encoding differs
    for b1, b2 in zip(c1.payloads, c2.payloads):
        for s1, s2 in zip(b1, b2):
            assert np.array_equal(s1, s2)


def test_v1_decompress_roundtrip(book1_head):
    """A v1 container written today decompresses identically to v2."""
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    v1 = cont.pack(cfg, book1_head.size, freqs, payloads, version=1)
    assert api.decompress(v1, backend="native") == book1_head.tobytes()


def test_read_header_both_versions(book1_head):
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=14, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    for version in (1, 2):
        blob = cont.pack(cfg, book1_head.size, freqs, payloads,
                         version=version)
        meta, off = cont.read_header(io.BytesIO(blob))
        assert np.array_equal(meta.freqs, freqs)
        ref = cont.unpack(blob)
        assert np.array_equal(meta.stream_words, ref.stream_words)
        # offset points exactly at the first payload byte
        total = sum(int(n) for n in ref.stream_words.reshape(-1))
        wsize = np.dtype(cont.word_dtype(cfg.variant)).itemsize
        assert off + total * wsize == len(blob)


def test_full_freq_degenerate_model():
    """Single-symbol input: one freq == 1<<prob_bits, which does not fit a
    prob_bits-wide field -- the v2 trailer byte carries it."""
    data = b"\x42" * 5000
    for pb in (12, 16):
        cfg = RansConfig(variant=Variant.BYTE, prob_bits=pb, n_lanes=256,
                         block_symbols=4096)
        blob = api.compress(data, cfg, backend="native")
        c = cont.unpack(blob)
        assert int(c.freqs[0x42]) == 1 << pb
        assert api.decompress(blob, backend="native") == data


def test_unknown_version_rejected(book1_head):
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    blob = bytearray(cont.pack(cfg, book1_head.size, freqs, payloads))
    blob[4] = 9
    with pytest.raises(ValueError, match="version"):
        cont.unpack(bytes(blob))
    with pytest.raises(ValueError, match="version"):
        cont.pack(cfg, book1_head.size, freqs, payloads, version=9)


def test_truncated_v2_counts_rejected(book1_head):
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    blob = cont.pack(cfg, book1_head.size, freqs, payloads)
    cut = 32 + cont.freqs_v2_size(cfg.prob_bits) + 1
    with pytest.raises(ValueError):
        cont.unpack(blob[:cut])


@pytest.mark.parametrize("version", [1, 2])
def test_truncation_anywhere_is_typed_error(book1_head, version):
    """Cutting the container at EVERY prefix inside the metadata area must
    raise a ValueError -- never a silent misparse (e.g. a short v2 freqs
    read whose last byte fakes the degenerate-model trailer) or a numpy
    shape error."""
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=512,
                     block_symbols=1 << 14)
    freqs, payloads = _payloads(cfg, book1_head)
    blob = cont.pack(cfg, book1_head.size, freqs, payloads,
                     version=version)
    full = cont.unpack(blob)
    meta_end = len(blob) - sum(
        w.size * w.dtype.itemsize for blk in full.payloads for w in blk)
    for cut in range(0, meta_end, 7):
        with pytest.raises(ValueError):
            cont.unpack(blob[:cut])
        with pytest.raises((ValueError, EOFError)):
            cont.read_header(io.BytesIO(blob[:cut]))
