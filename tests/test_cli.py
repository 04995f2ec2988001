"""CLI driver tests (python -m ryg_rans_tpu ...)."""

import numpy as np

from ryg_rans_tpu.__main__ import main


def test_cli_roundtrip(tmp_path, book1_head, capsys):
    src = tmp_path / "in.bin"
    src.write_bytes(book1_head[:20000].tobytes())
    blob = tmp_path / "out.trns"
    dec = tmp_path / "dec.bin"

    assert main(["compress", str(src), str(blob), "--variant", "word",
                 "--lanes", "64", "--block-symbols", "8192",
                 "--backend", "numpy"]) == 0
    assert main(["info", str(blob)]) == 0
    out = capsys.readouterr().out
    assert "WORD" in out and "orig_len         20000" in out
    assert main(["decompress", str(blob), str(dec),
                 "--backend", "numpy"]) == 0
    assert dec.read_bytes() == src.read_bytes()


def test_cli_bench_smoke(tmp_path, book1_head, capsys):
    src = tmp_path / "in.bin"
    src.write_bytes(book1_head[:8192].tobytes())
    rc = main(["bench", str(src), "--variant", "byte", "--lanes", "32",
               "--block-symbols", "4096", "--runs", "1",
               "--backend", "numpy"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "decode ok!" in out
    assert "bits/byte" in out


def test_cli_auto_shape_keeps_lanes_per_stream(tmp_path, book1_head):
    """--lanes-per-stream without --lanes (size-adaptive default shape)
    must keep the requested substream layout (r3 review fix)."""
    from ryg_rans_tpu.utils import container as cont

    src = tmp_path / "in.bin"
    src.write_bytes(book1_head[:20000].tobytes())
    blob = tmp_path / "out.trns"
    assert main(["compress", str(src), str(blob),
                 "--lanes-per-stream", "64", "--backend", "native"]) == 0
    c = cont.unpack(blob.read_bytes())
    assert c.cfg.lanes_per_stream == 64
    dec = tmp_path / "dec.bin"
    assert main(["decompress", str(blob), str(dec),
                 "--backend", "native"]) == 0
    assert dec.read_bytes() == src.read_bytes()
