"""Container + public compress/decompress API tests."""

import numpy as np
import pytest

from ryg_rans_tpu import api, native
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.utils import container as cont

VARIANTS = [Variant.BYTE, Variant.WORD, Variant.RANS64, Variant.ALIAS]


def _cfg(variant, **kw):
    defaults = dict(
        variant=variant,
        prob_bits={Variant.WORD: 12, Variant.ALIAS: 16}.get(variant, 14),
        n_lanes=64, lanes_per_stream=32, block_symbols=8192)
    defaults.update(kw)
    return RansConfig(**defaults)


@pytest.mark.parametrize("variant", VARIANTS)
def test_compress_roundtrip_numpy(book1_head, variant):
    data = book1_head[:20000].tobytes()
    blob = api.compress(data, _cfg(variant), backend="numpy")
    assert api.decompress(blob, backend="numpy") == data


@pytest.mark.skipif(not native.available(), reason="no native core")
@pytest.mark.parametrize("variant", VARIANTS)
def test_native_and_numpy_containers_identical(book1_head, variant):
    data = book1_head[:20000].tobytes()
    cfg = _cfg(variant)
    blob_np = api.compress(data, cfg, backend="numpy")
    blob_c = api.compress(data, cfg, backend="native")
    assert blob_np == blob_c
    assert api.decompress(blob_c, backend="native") == data
    # cross-backend decode
    assert api.decompress(blob_np, backend="native") == data
    assert api.decompress(blob_c, backend="numpy") == data


def test_multiblock_roundtrip(book1_head):
    cfg = _cfg(Variant.WORD, block_symbols=4096)
    data = book1_head[:30000].tobytes()  # 7 full blocks + tail
    blob = api.compress(data, cfg, backend="numpy")
    c = cont.unpack(blob)
    assert len(c.payloads) == 8
    assert api.decompress(blob, backend="numpy") == data


def test_empty_input():
    blob = api.compress(b"", _cfg(Variant.WORD))
    assert api.decompress(blob) == b""


def test_crc_detects_corruption(book1_head):
    data = book1_head[:10000].tobytes()
    blob = bytearray(api.compress(data, _cfg(Variant.WORD), backend="numpy"))
    blob[len(blob) // 2] ^= 0x40  # flip a payload bit mid-stream
    with pytest.raises(ValueError, match="crc|container"):
        api.decompress(bytes(blob), backend="numpy")


def test_container_rejects_garbage():
    with pytest.raises(ValueError):
        cont.unpack(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError):
        api.decompress(b"TRNS" + b"\0" * 10)


def test_container_fields_roundtrip(book1_head):
    cfg = _cfg(Variant.ALIAS)
    data = book1_head[:5000].tobytes()
    c = cont.unpack(api.compress(data, cfg, backend="numpy"))
    assert c.cfg.variant == Variant.ALIAS
    assert c.cfg.prob_bits == 16
    assert c.cfg.n_lanes == 64
    assert c.cfg.lanes_per_stream == 32
    assert c.orig_len == 5000
    assert int(c.freqs.sum()) == 1 << 16


@pytest.mark.skipif(not native.available(), reason="no native core")
def test_compression_ratio_book1_native(book1):
    """Container overhead stays small: payload within 1.6 KiB + 0.2% of the
    reference 8-way size on full book1."""
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=8,
                     lanes_per_stream=8, block_symbols=1 << 20)
    blob = api.compress(book1.tobytes(), cfg, backend="native")
    assert api.decompress(blob, backend="native") == book1.tobytes()
    assert len(blob) < 435626 + 1600 + int(0.002 * 435626)


@pytest.mark.parametrize("variant", [
    pytest.param(v, marks=pytest.mark.slow) if v == Variant.ALIAS else v
    for v in VARIANTS])
def test_tpu_backend_container_matches_numpy(book1_head, variant):
    """The TPU kernel path (interpret mode here) must produce the exact
    container the numpy oracle produces, and cross-decode."""
    from ryg_rans_tpu.config import DEFAULT_PROB_BITS
    cfg = RansConfig(variant=variant, prob_bits=DEFAULT_PROB_BITS[variant],
                     n_lanes=128, lanes_per_stream=128, block_symbols=4096)
    data = book1_head[:10000].tobytes()
    blob_np = api.compress(data, cfg, backend="numpy")
    blob_tpu = api.compress(data, cfg, backend="tpu")
    assert blob_np == blob_tpu
    assert api.decompress(blob_tpu, backend="tpu") == data
    assert api.decompress(blob_np, backend="tpu") == data


def test_decompress_block_random_access(book1_head):
    data = book1_head[:30000].tobytes()
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=64,
                     lanes_per_stream=64, block_symbols=4096)
    blob = api.compress(data, cfg, backend="numpy")
    n_blocks = len(cont.unpack(blob).payloads)
    got = b"".join(api.decompress_block(blob, b, backend="numpy")
                   for b in range(n_blocks))
    assert got == data
    # out-of-order single-block access
    assert api.decompress_block(blob, 3, backend="numpy") \
        == data[3 * 4096:4 * 4096]
    with pytest.raises(IndexError):
        api.decompress_block(blob, n_blocks, backend="numpy")


def test_decompress_block_crc(book1_head):
    data = book1_head[:10000].tobytes()
    cfg = RansConfig(variant=Variant.BYTE, prob_bits=14, n_lanes=64,
                     lanes_per_stream=64, block_symbols=4096)
    blob = bytearray(api.compress(data, cfg, backend="numpy"))
    # corrupt the last block's flushed-state head (its payload sits at the
    # container's end; a tail-pad byte would be sliced off and pass CRC)
    last_payload = int(cont.unpack(bytes(blob)).stream_words[-1, 0])
    blob[len(blob) - last_payload + 3] ^= 0x10
    n_blocks = len(cont.unpack(bytes(blob)).payloads)
    assert api.decompress_block(bytes(blob), 0, backend="numpy") \
        == data[:4096]
    with pytest.raises(ValueError, match="crc"):
        api.decompress_block(bytes(blob), n_blocks - 1, backend="numpy")


@pytest.mark.parametrize("variant", VARIANTS)
def test_decompress_to_device(book1_head, variant):
    import numpy as np
    from ryg_rans_tpu.config import DEFAULT_PROB_BITS
    pb = DEFAULT_PROB_BITS[variant]
    if variant == Variant.RANS64:
        pb = min(pb, 15)
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=1024,
                     lanes_per_stream=1024, block_symbols=8192)
    data = book1_head[:20000].tobytes()
    blob = api.compress(data, cfg, backend="numpy")
    out = api.decompress_to_device(blob)
    assert bytes(np.asarray(out).tobytes()) == data


@pytest.mark.parametrize("pb", [
    20, pytest.param(31, marks=pytest.mark.slow)])
def test_cross_backend_rans64_high_precision(book1_head, pb):
    """RANS64 near-entropy precision (rans64.h:169): numpy, native, and
    the TPU kernel path must produce the identical container at
    prob_bits > 16 and cross-decode."""
    cfg = RansConfig(variant=Variant.RANS64, prob_bits=pb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=4096)
    data = book1_head[:10000].tobytes()
    blob_np = api.compress(data, cfg, backend="numpy")
    blob_tpu = api.compress(data, cfg, backend="tpu")
    assert blob_np == blob_tpu
    if native.available():
        assert api.compress(data, cfg, backend="native") == blob_np
        assert api.decompress(blob_np, backend="native") == data
    assert api.decompress(blob_tpu, backend="tpu") == data


def test_decompress_to_device_raw_blocks(book1_head, rng):
    """decompress_to_device handles containers with raw blocks: coded
    blocks decode through the kernel, raw bytes transfer verbatim."""
    import numpy as np
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=1024,
                     lanes_per_stream=1024, block_symbols=8192)
    # block 0 compressible, block 1 random (raw), short raw tail
    data = (book1_head[:8192].tobytes()
            + rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
            + b"\x07" * 100)
    blob = api.compress(data, cfg, backend="numpy")
    c = cont.unpack(blob)
    assert c.raw is not None and bool(c.raw[1])
    out = api.decompress_to_device(blob)
    assert bytes(np.asarray(out).tobytes()) == data


@pytest.mark.parametrize("variant,pb", [
    (Variant.WORD, 12), (Variant.BYTE, 14),
    pytest.param(Variant.ALIAS, 16, marks=pytest.mark.slow),
    pytest.param(Variant.RANS64, 14, marks=pytest.mark.slow),
    pytest.param(Variant.RANS64, 20, marks=pytest.mark.slow),
])
def test_compress_from_device_matches_host(book1_head, variant, pb):
    """Device-side compression produces the byte-identical container the
    host path produces, and it round-trips back to device."""
    import jax.numpy as jnp
    import numpy as np
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=1024,
                     lanes_per_stream=1024, block_symbols=8192,
                     checksum=False)
    data = book1_head[:20000]
    blob = api.compress_from_device(jnp.asarray(data), cfg)
    assert blob == api.compress(data.tobytes(), cfg, backend="numpy")
    out = api.decompress_to_device(blob)
    assert np.array_equal(np.asarray(out), data)


def test_compress_from_device_raw_and_edges(rng):
    """Raw fallback + empty input + checksum rejection on the device path."""
    import jax.numpy as jnp
    import numpy as np
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=1024,
                     lanes_per_stream=1024, block_symbols=8192,
                     checksum=False)
    data = rng.integers(0, 256, 10000, dtype=np.uint8)
    blob = api.compress_from_device(jnp.asarray(data), cfg)
    assert blob == api.compress(data.tobytes(), cfg, backend="numpy")
    assert cont.unpack(blob).raw is not None
    assert api.decompress(blob, backend="numpy") == data.tobytes()

    empty = api.compress_from_device(jnp.zeros(0, jnp.uint8), cfg)
    assert api.decompress(empty) == b""

    with pytest.raises(ValueError, match="checksum"):
        api.compress_from_device(
            jnp.asarray(data),
            RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=1024,
                       block_symbols=8192, checksum=True))
