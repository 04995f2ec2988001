"""Bounded-memory file compression tests."""

import numpy as np
import pytest

from ryg_rans_tpu import api
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.utils import stream_io


def _cfg(**kw):
    d = dict(variant=Variant.WORD, prob_bits=12, n_lanes=64,
             lanes_per_stream=64, block_symbols=8192)
    d.update(kw)
    return RansConfig(**d)


@pytest.mark.parametrize("batch", [1, 3, 100])
def test_file_roundtrip_matches_memory_api(tmp_path, book1_head, batch):
    data = book1_head[:50000].tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.trns"
    stream_io.compress_file(str(src), str(dst), _cfg(), backend="numpy",
                            blocks_per_batch=batch)
    blob = dst.read_bytes()
    # byte-identical to the in-memory compressor
    assert blob == api.compress(data, _cfg(), backend="numpy")
    rt = tmp_path / "rt.bin"
    n = stream_io.decompress_file(str(dst), str(rt), backend="numpy",
                                  blocks_per_batch=batch)
    assert n == len(data)
    assert rt.read_bytes() == data


def test_file_empty(tmp_path):
    src = tmp_path / "empty"
    src.write_bytes(b"")
    dst = tmp_path / "e.trns"
    stream_io.compress_file(str(src), str(dst), _cfg(), backend="numpy")
    rt = tmp_path / "rt"
    assert stream_io.decompress_file(str(dst), str(rt),
                                     backend="numpy") == 0
    assert rt.read_bytes() == b""


def test_file_crc_detects_corruption(tmp_path, book1_head):
    data = book1_head[:20000].tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.trns"
    stream_io.compress_file(str(src), str(dst), _cfg(), backend="numpy")
    blob = bytearray(dst.read_bytes())
    blob[1100] ^= 0x20  # inside the first block's payload/head region
    bad = tmp_path / "bad.trns"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        stream_io.decompress_file(str(bad), str(tmp_path / "x"),
                                  backend="numpy")


def test_alias_variant_file(tmp_path, book1_head):
    data = book1_head[:20000].tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.trns"
    cfg = _cfg(variant=Variant.ALIAS, prob_bits=16)
    stream_io.compress_file(str(src), str(dst), cfg, backend="numpy")
    assert dst.read_bytes() == api.compress(data, cfg, backend="numpy")
    rt = tmp_path / "rt.bin"
    stream_io.decompress_file(str(dst), str(rt), backend="numpy")
    assert rt.read_bytes() == data


def test_file_roundtrip_raw_blocks(tmp_path, rng):
    """Incompressible file content goes through the raw-block path in the
    streaming writer/reader; container stays byte-identical to the
    in-memory API's."""
    from ryg_rans_tpu import api
    from ryg_rans_tpu.utils import container as cont, stream_io

    cfg = _cfg()
    B = cfg.block_symbols
    data = rng.integers(0, 256, 2 * B + B // 3, dtype=np.uint8).tobytes()
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.trns"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    stream_io.compress_file(str(src), str(dst), cfg, backend="numpy",
                            blocks_per_batch=2)
    blob = dst.read_bytes()
    assert blob == api.compress(data, cfg, backend="numpy")
    assert cont.unpack(blob).raw is not None
    stream_io.decompress_file(str(dst), str(back), backend="numpy")
    assert back.read_bytes() == data
