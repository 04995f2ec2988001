"""Pin the compression-ratio half of the headline in a committed artifact.

Container bytes are deterministic and backend-independent (the suite
enforces tpu/native/numpy byte-identity), so the bits/byte of every
headline operating point can be captured on the native CPU backend even
when the TPU tunnel is down — exactly the figure bench.py reports next to
its throughput (`len(api.compress(...))` at the benched config; reference
ratio posture: container size printed per run, main.cpp:252).

Run: `python benchmarks/ratio_artifact.py [out.json]`
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference 2-way interleaved rans_byte on book1 (BASELINE.md): 435,117 B
REF_BITS_PER_BYTE = 435117 * 8 / 768771


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None

    from ryg_rans_tpu import api
    from ryg_rans_tpu.config import RansConfig, Variant

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    R, NB, BS = 128, 4, 1 << 23          # bench.py headline shape
    N, SYMS = R * 128, 4 * (1 << 23)
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS].tobytes()

    rows = []
    for vname, pb in (("ALIAS", 16), ("WORD", 11), ("WORD", 12),
                      ("BYTE", 14), ("RANS64", 14)):
        cfg = RansConfig(variant=Variant[vname], prob_bits=pb, n_lanes=N,
                         block_symbols=BS)
        nbytes = len(api.compress(data, cfg, backend="native"))
        bpb = nbytes * 8 / SYMS
        rows.append({"variant": vname, "prob_bits": pb,
                     "container_bytes": nbytes,
                     "bits_per_byte": round(bpb, 4),
                     "ratio_vs_reference": round(bpb / REF_BITS_PER_BYTE,
                                                 4)})
        print(f"{vname:6s} pb={pb:2d} {nbytes} B  {bpb:.4f} b/B  "
              f"{bpb / REF_BITS_PER_BYTE:.4f}x ref", flush=True)

    rec = {"shape": {"n_lanes": N, "n_blocks": NB, "block_symbols": BS},
           "corpus": "book1 tiled to 33.6 MB (bench.py headline corpus)",
           "reference_bits_per_byte": round(REF_BITS_PER_BYTE, 4),
           "note": "container bytes are backend-independent (suite-"
                   "enforced); captured on the native backend",
           "rows": rows}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
