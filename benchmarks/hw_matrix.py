"""Compiled round-trip matrix: every variant x prob_bits on real hardware.

The CPU test suite runs the same logic in Pallas interpret mode; this gate
proves the COMPILED kernels (Mosaic lowering, MXU precision, VMEM budgets)
at every supported precision.  r2 result: 26/26 byte-exact.

Run on a chip: `python benchmarks/hw_matrix.py` (~10 min of compiles).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    ok = 0
    for v, pb in cases:
        cfg = RansConfig(variant=v, prob_bits=pb, n_lanes=1024,
                         block_symbols=1 << 16)
        blob = api.compress(data, cfg, backend="tpu")
        good = api.decompress(blob, backend="tpu") == data
        ok += good
        print(f"{v.name:6s} pb={pb:2d} compiled roundtrip "
              f"{'ok' if good else 'FAIL'}", flush=True)
    print(f"{ok}/{len(cases)} compiled round-trips byte-exact", flush=True)
    return 0 if ok == len(cases) else 1


if __name__ == "__main__":
    sys.exit(main())
