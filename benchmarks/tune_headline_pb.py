"""A/B the headline candidates' prob_bits at the bench.py shape.

bench.py's headline is max(ALIAS pb16, WORD pb11) at R=128, NB=4,
BS=2^23.  The r3 fused bisect keys (docs/DESIGN.md) remove one dependent
gather from the WORD/BYTE bisect decode path at prob_bits 14-15, which may
move the speed/ratio frontier: pb14/15 models compress better than pb11
(finer frequencies) and the bisect path may now be as fast as the sym4
sweep.  Prints one row per candidate; run on the real chip.

Usage: python benchmarks/tune_headline_pb.py [out.json]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from ryg_rans_tpu.models import stats

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    R, NB, BS = 128, 4, 1 << 23
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]

    # (variant, prob_bits, slot_direct, ilp)
    cands = [("WORD", 11, False, 2), ("WORD", 11, True, 2),
             ("WORD", 12, True, 2), ("WORD", 12, False, 2),
             ("WORD", 14, False, 2), ("WORD", 15, False, 2),
             ("BYTE", 14, False, 2), ("ALIAS", 16, False, 2),
             ("ALIAS", 16, False, 4)]
    models = {pb: stats.build_model(data, pb)
              for pb in sorted({pb for _, pb, _, _ in cands})}

    rows = []
    for name, pb, sd, ilp in cands:
        try:
            gbs, nbytes = bench._bench_variant(name, pb, data, models, R,
                                               NB, BS, slot_direct=sd,
                                               ilp=ilp)
        except Exception as e:  # noqa: BLE001 - per-candidate guard
            print(f"{name} pb={pb} sd={sd} ilp={ilp}: "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        bpb = 8.0 * nbytes / SYMS
        print(f"{name:6s} pb={pb:2d}{' sd' if sd else '   '} ilp={ilp} "
              f"decode {gbs:6.3f} GB/s  {bpb:.4f} bits/byte", flush=True)
        rows.append({"variant": name, "prob_bits": pb, "slot_direct": sd,
                     "ilp": ilp, "decode_gbs": round(gbs, 3),
                     "bits_per_byte": round(bpb, 4)})

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"shape": {"R": R, "n_blocks": NB,
                                 "block_symbols": BS}, "rows": rows}, f,
                      indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
