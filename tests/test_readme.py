"""The README's front door must actually work (VERDICT r1 weak #1).

Executes the quick-start snippets (with a truncated corpus so interpret-mode
Pallas stays fast) and pins the routing contract: a *default* RansConfig on
a machine with a live TPU routes to the Pallas kernels, and the explicit
README example config is kernel-supported.
"""

import numpy as np
import pytest

import ryg_rans_tpu as rt
from ryg_rans_tpu import api
from ryg_rans_tpu.config import RansConfig, Variant


def test_quickstart_default_roundtrip(book1):
    # README: blob = rt.compress(open("book1","rb").read());
    #         data = rt.decompress(blob)
    raw = book1.tobytes()
    blob = rt.compress(raw)
    assert rt.decompress(blob) == raw


def test_quickstart_explicit_config_roundtrip(book1_head):
    # README: cfg = rt.RansConfig(variant=rt.Variant.ALIAS, prob_bits=16,
    #                             n_lanes=8192)
    #         blob = rt.compress(data, cfg, backend="tpu")
    # (truncated input: interpret-mode Pallas at 8192 lanes is slow on CPU;
    #  the same call compiles on a real chip -- examples/readme_check.py)
    data = book1_head[:30000].tobytes()
    cfg = rt.RansConfig(variant=rt.Variant.ALIAS, prob_bits=16, n_lanes=8192)
    blob = rt.compress(data, cfg, backend="tpu")
    assert rt.decompress(blob, backend="tpu") == data


def test_default_config_is_tpu_supported():
    """rt.compress(data) with no config must reach the Pallas kernels on a
    TPU machine: default lanes_per_stream == n_lanes and the kernel
    constraints hold for any input size."""
    cfg = RansConfig()
    assert cfg.lanes_per_stream == cfg.n_lanes
    for size in (1, 1000, 1 << 19, (1 << 19) + 1, 10 << 20):
        assert api._tpu_supported(cfg, size)


def test_default_config_routes_to_tpu_when_live(monkeypatch):
    monkeypatch.setattr(api, "_tpu_live", lambda: True)
    assert api._pick_backend(RansConfig(), "auto", 1 << 20) == "tpu"


@pytest.mark.parametrize("variant,pb", [
    (Variant.BYTE, 14), (Variant.WORD, 12), (Variant.RANS64, 14),
    (Variant.ALIAS, 16),
])
def test_readme_variant_configs_supported(variant, pb):
    """Every variant's demo-equivalent config is kernel-reachable."""
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=1024)
    assert api._tpu_supported(cfg, 1 << 20)


def test_single_block_small_lane_configs_supported():
    """n_lanes 256/512 compile only as single-block grids (Mosaic sublane
    slicing needs R % 8 == 0 for multi-block); routing honors that."""
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=256,
                     block_symbols=1 << 15)
    assert api._tpu_supported(cfg, 1 << 15)        # fits one block
    assert not api._tpu_supported(cfg, 1 << 16)    # needs 2 blocks
    assert not api._tpu_supported(cfg)             # size unknown


def test_auto_config_adapts_to_size():
    """rt.compress(data) with no config uses RansConfig.auto: every shape
    it picks must reach the Pallas kernels, keep the flushed-lane head
    under ~1% of the input, and converge to the benchmarked Pareto shape
    (16384 lanes, 2^23-symbol blocks) for large inputs."""
    for size in (0, 1, 5000, 700_000, 768_771, 4 << 20, 33 << 20, 1 << 28):
        cfg = RansConfig.auto(size)
        assert api._tpu_supported(cfg, size), (size, cfg)
        assert cfg.block_symbols % (4 * cfg.n_lanes) == 0
        if size >= 1 << 20:
            assert 4 * cfg.n_lanes <= 0.01 * size  # head budget per block
    assert RansConfig.auto(768_771).n_lanes == 1024   # book1: ratio-optimal
    assert RansConfig.auto(768_771).variant == Variant.WORD
    big = RansConfig.auto(33 << 20)
    assert big.n_lanes == 16384 and big.block_symbols == 1 << 23
    # large inputs get the headline operating point (r5: WORD pb11 with
    # the byte-plane fetch -- fastest decode AND encode,
    # HEADLINE_TUNE_r05.json)
    assert big.variant == Variant.WORD and big.prob_bits == 11
    # an explicit variant is never overridden
    assert RansConfig.auto(33 << 20, Variant.WORD).variant == Variant.WORD


def test_perf_table_numbers_match_committed_artifacts():
    """Every throughput number in the README's measured-performance table
    must be quoted from the committed artifact its row cites (VERDICT r3
    task 7: no claim/artifact drift)."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()

    table = re.findall(
        r"^\| (ALIAS|WORD|BYTE|RANS64)[^|]*\|[^|]*\| ([^|]+)\|([^|]+)\|"
        r"[^|]*\|[^|]*\| ([^|]+)\|$",
        readme, re.M)
    assert len(table) == 4, "README perf table shape changed"

    for variant, dec_cell, enc_cell, artifact_cell in table:
        arts = [a.strip() for a in artifact_cell.split(",")]
        var_rows = {"decode": [], "encode": []}
        for a in arts:
            data = json.loads((root / a).read_text())
            for row in data["rows"]:
                if row["variant"] != variant:
                    continue
                if "decode_gbs" in row:
                    var_rows["decode"].append(row["decode_gbs"])
                if "encode_kernel_gbs" in row:
                    var_rows["encode"].append(row["encode_kernel_gbs"])
        dec_quoted = [float(x) for x in re.findall(r"\d+\.\d+", dec_cell)]
        enc_quoted = [float(x) for x in re.findall(r"\d+\.\d+", enc_cell)]
        assert var_rows["decode"] and var_rows["encode"], (variant, arts)
        for q in dec_quoted:
            assert any(abs(q - round(v, 1)) < 0.051 for v in
                       var_rows["decode"]), \
                (variant, q, "decode not in artifact", var_rows["decode"])
        for q in enc_quoted:
            assert any(abs(q - round(v, 1)) < 0.051 for v in
                       var_rows["encode"]), \
                (variant, q, "encode not in artifact", var_rows["encode"])


def test_readme_e2e_matches_device_artifact():
    """The README's device-resident end-to-end figure must be quoted from
    the committed E2E_DEVICE artifact (same no-drift rule as the table)."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()
    m = re.search(r"sustains\s+\*\*(\d+\.\d+) GB/s\*\* \(E2E_DEVICE_r05",
                  readme)
    assert m, "README no longer quotes the device e2e figure"
    art = json.loads((root / "E2E_DEVICE_r05.json").read_text())
    assert abs(float(m.group(1)) - round(art["value"], 2)) < 0.005


def test_readme_host_numbers_match_native_artifact():
    """The README's host-path decode pairs (ours vs same-session
    reference) must be quoted from NATIVE_r05.json."""
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()
    m = re.search(
        r"WORD (\d+\.\d+) vs (\d+\.\d+) GB/s.*?BYTE\s*"
        r"(\d+\.\d+) vs (\d+\.\d+), ALIAS (\d+\.\d+) vs (\d+\.\d+), "
        r"RANS64 (\d+\.\d+)\s*vs (\d+\.\d+)", readme, re.S)
    assert m, "README host paragraph shape changed"
    art = json.loads((root / "NATIVE_r05.json").read_text())
    ours = {r["variant"]: r["decode_gbs"] for r in art["rows"]}
    ref = art["reference_same_session_gbs"]
    ref_best = {
        "WORD": ref["word_dec8_simd"], "BYTE": ref["byte_dec2"],
        "ALIAS": ref["alias_dec2"], "RANS64": ref["rans64_dec2"]}
    got = [float(g) for g in m.groups()]
    for i, v in enumerate(("WORD", "BYTE", "ALIAS", "RANS64")):
        assert abs(got[2 * i] - ours[v]) < 0.0151, (v, got[2 * i], ours[v])
        assert abs(got[2 * i + 1] - ref_best[v]) < 0.0151, \
            (v, got[2 * i + 1], ref_best[v])


def test_readme_ratio_matches_ratio_artifact():
    """The README's headline bits/byte figure must equal the committed
    RATIO artifact captured through the real api.compress front door."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    readme = (root / "README.md").read_text()
    rows = json.loads((root / "RATIO_r05.json").read_text())["rows"]
    word = next(r for r in rows
                if r["variant"] == "WORD" and r["prob_bits"] == 11)
    assert f"{word['bits_per_byte']:.4f}" in readme
    # and the ~1.4%-over-reference claim is the artifact's ratio
    assert abs(word["ratio_vs_reference"] - 1.0136) < 0.0005
