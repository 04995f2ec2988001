"""Example: compression ratio vs prob_bits, approaching the entropy floor.

The reference's selling point for rans64 is scale_bits up to 31 --
"precision almost as good as 64-bit arithmetic coders" (rans64.h README
lines 10-11).  This sweep shows the coded size closing in on the order-0
entropy floor as prob_bits grows, for each variant at its supported range.

Run: `python examples/precision_sweep.py [path]` (defaults to book1;
uses the host backends, so no TPU required).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ryg_rans_tpu import api, native
    from ryg_rans_tpu.config import RansConfig, Variant

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/book1"
    data = open(path, "rb").read()
    arr = np.frombuffer(data, np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    floor = int(np.ceil(entropy * arr.size / 8))
    print(f"{path}: {len(data)} bytes, order-0 entropy {entropy:.3f} "
          f"bits/byte -> floor {floor} bytes\n")

    be = "native" if native.available() else "numpy"
    # small lanes/no CRC: isolate the coding precision from layout overhead
    print(f"{'variant':8s} {'pb':>3s} {'bytes':>9s} {'bits/byte':>9s} "
          f"{'over floor':>10s}")
    for variant, pbs in ((Variant.RANS64, (10, 12, 14, 16, 20, 24, 31)),
                         (Variant.BYTE, (10, 12, 14, 16)),
                         (Variant.WORD, (10, 12, 15)),
                         (Variant.ALIAS, (10, 12, 14, 16))):
        for pb in pbs:
            cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=4,
                             lanes_per_stream=4, block_symbols=1 << 20,
                             checksum=False)
            blob = api.compress(data, cfg, backend=be)
            bb = 8 * len(blob) / len(data)
            over = 100 * (len(blob) - floor) / floor
            print(f"{variant.name:8s} {pb:3d} {len(blob):9d} {bb:9.4f} "
                  f"{over:+9.2f}%")
        print()


if __name__ == "__main__":
    main()
