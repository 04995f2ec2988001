"""Compiled round-trip matrix: every variant x prob_bits on real hardware.

The CPU test suite runs the same logic in Pallas interpret mode; this gate
proves the COMPILED kernels (Mosaic lowering, MXU precision, VMEM budgets)
at every supported precision.  It is the framework's analog of the
reference's always-on self-verification (every demo run memcmp-checks its
round-trip, main.cpp:211-214) for paths the CPU suite cannot see.

Run on a chip: `python benchmarks/hw_matrix.py [out.json]` (~10 min of
compiles), or `pytest -m hw` (tests/test_hw_gate.py).  Writes a JSON
artifact ({"rows": [{variant, prob_bits, ok}...], "ok", "total"}) to the
given path (default HW_MATRIX.json at the repo root).  r2 result: 26/26.
"""

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def run_matrix(out_path: str) -> int:
    from ryg_rans_tpu import api
    from ryg_rans_tpu.config import RansConfig, Variant

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    data = book1[:200000].tobytes()
    cases = []
    for v, maxpb in ((Variant.BYTE, 16), (Variant.WORD, 15),
                     (Variant.ALIAS, 16), (Variant.RANS64, 31)):
        for pb in (9, 12, 13, 14, 15, 16, 20, 24, 31):
            if pb <= maxpb:
                cases.append((v, pb))
    # precision matrix at a small shape, plus the HEADLINE shapes (16384
    # lanes, big blocks -- the configs bench.py and RansConfig.auto
    # actually ship for large inputs) at full scale
    big = np.tile(book1, ((1 << 24) // book1.size) + 1)[:1 << 24].tobytes()
    shaped = [(v, pb, 1024, 1 << 16, data) for v, pb in cases]
    shaped += [
        (Variant.ALIAS, 16, 16384, 1 << 23, big),
        (Variant.WORD, 11, 16384, 1 << 23, big),
    ]
    rows = []
    for v, pb, lanes, bs, payload in shaped:
        cfg = RansConfig(variant=v, prob_bits=pb, n_lanes=lanes,
                         block_symbols=bs)
        try:
            blob = api.compress(payload, cfg, backend="tpu")
            good = api.decompress(blob, backend="tpu") == payload
        except Exception as e:  # a compile failure is a FAIL row, not a crash
            print(f"{v.name} pb={pb}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            good = False
        rows.append({"variant": v.name, "prob_bits": pb, "n_lanes": lanes,
                     "block_symbols": bs, "ok": bool(good)})
        print(f"{v.name:6s} pb={pb:2d} lanes={lanes:5d} compiled roundtrip "
              f"{'ok' if good else 'FAIL'}", flush=True)
    cases = shaped
    ok = sum(r["ok"] for r in rows)
    result = {"rows": rows, "ok": ok, "total": len(cases)}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"{ok}/{len(cases)} compiled round-trips byte-exact -> {out_path}",
          flush=True)
    return 0 if ok == len(cases) else 1


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _ROOT, "HW_MATRIX.json")
    return run_matrix(out)


if __name__ == "__main__":
    sys.exit(main())
