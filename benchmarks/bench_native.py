"""Native C++ host-codec benchmark: encode/decode GB/s per variant on book1.

The native core is the host fallback and bit-exactness oracle; since r3 it
carries AVX2 SIMD decode paths for all four variants and an AVX2 WORD
encoder (csrc/rans_core.cpp, docs/DESIGN.md).  This emits the
machine-checkable artifact for those numbers -- the host-side analog of
bench_variants.py.  Reference comparison points measured on THIS host from
-O3 builds of /root/reference (BASELINE.md): SSE 4.1 8-way word decode
542 MB/s, scalar byte decode 133-200 MB/s, best encode 387 MB/s.

Run: `python benchmarks/bench_native.py [out.json]` (pure CPU, no jax).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ryg_rans_tpu import native
    from ryg_rans_tpu.config import DEFAULT_PROB_BITS, RansConfig, Variant

    from ryg_rans_tpu.models import stats

    if not native.available():
        print("native core unavailable", file=sys.stderr)
        return 1

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    rows = []
    for variant in (Variant.WORD, Variant.BYTE, Variant.ALIAS,
                    Variant.RANS64):
        pb = DEFAULT_PROB_BITS[variant]
        cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=1024,
                         lanes_per_stream=128, block_symbols=1 << 20)
        freqs, cum = stats.build_model(book1, pb)

        def best_of(fn, n=7):
            b = 1e9
            for _ in range(n):
                t0 = time.perf_counter()
                r = fn()
                b = min(b, time.perf_counter() - t0)
            return b, r

        tenc, (payload, words) = best_of(
            lambda: native.encode(cfg, book1, freqs, cum))
        tdec, dec = best_of(
            lambda: native.decode(cfg, payload, words, book1.size, freqs,
                                  cum))
        ok = np.array_equal(dec, book1)
        enc_gbs = book1.size / tenc / 1e9
        dec_gbs = book1.size / tdec / 1e9
        print(f"{variant.name:6s} pb={pb:2d} encode {enc_gbs:6.3f} "
              f"decode {dec_gbs:6.3f} GB/s  payload {len(payload)} B  "
              f"roundtrip={'ok' if ok else 'FAIL'}", flush=True)
        rows.append({"variant": variant.name, "prob_bits": pb,
                     "encode_gbs": round(enc_gbs, 4),
                     "decode_gbs": round(dec_gbs, 4),
                     "payload_bytes": len(payload),
                     "roundtrip_ok": bool(ok)})

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({
                "note": "native C++ host codec (AVX2 decode r3 + AVX2/reciprocal encode r4), book1, "
                        "N=1024/lps=128; reference on this host: SSE word "
                        "decode 0.542 GB/s, scalar byte decode 0.133-0.200,"
                        " best encode 0.387",
                "rows": rows}, f, indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
