"""Native C++ host-codec benchmark: encode/decode GB/s per variant on book1.

The native core is the host fallback and bit-exactness oracle; since r3 it
carries AVX2 SIMD decode paths for all four variants and an AVX2 WORD
encoder (csrc/rans_core.cpp, docs/DESIGN.md).  This emits the
machine-checkable artifact for those numbers -- the host-side analog of
bench_variants.py.

With --with-reference it additionally builds the four unmodified reference
demos from /root/reference, runs them IN THE SAME SESSION, parses their
self-timed printouts (main.cpp:169-186 posture) and records both sides in
one artifact -- this virtualized host's throughput swings ~±30% between
sessions, so only same-window pairs are comparable (cross-session
BASELINE.md points: SSE 4.1 8-way word decode 542 MB/s, scalar byte decode
133-200 MB/s, best encode 387 MB/s).

Run: `python benchmarks/bench_native.py [out.json] [--with-reference]`
(pure CPU, no jax).
"""

import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = pathlib.Path("/root/reference")
# each demo prints 5 self-timed rate lines per phase, in this phase order
# (main.cpp / main64.cpp / main_simd.cpp / main_alias.cpp driver layout)
REF_DEMOS = {
    "byte": ("main.cpp", ["enc", "dec", "enc2", "dec2"]),
    "rans64": ("main64.cpp", ["enc", "dec", "enc2", "dec2"]),
    "word": ("main_simd.cpp", ["enc", "dec", "enc2", "dec2", "enc8",
                               "dec8_simd"]),
    "alias": ("main_alias.cpp", ["enc", "dec", "enc2", "dec2"]),
}


def bench_reference():
    """Build + run the unmodified reference demos; return best GB/s per
    (demo, phase).  Rates are parsed from the 'N clocks/symbol (X MiB/s)'
    lines; both 'MiB/s' and 'MB/s' labels use the same 1048576 divisor
    (main.cpp:186), so one conversion applies."""
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for name, (src, phases) in REF_DEMOS.items():
            exe = os.path.join(td, name)
            cmd = ["g++", "-O3", str(REF / src), "-o", exe]
            if name == "word":
                cmd.insert(2, "-msse4.1")
            subprocess.run(cmd, check=True, capture_output=True, cwd=REF)
            r = subprocess.run([exe], check=True, capture_output=True,
                               text=True, cwd=REF, timeout=600)
            rates = [float(m) for m in
                     re.findall(r"\(\s*([\d.]+)Mi?B/s\)", r.stdout)]
            assert len(rates) == 5 * len(phases), (name, len(rates))
            assert "ERROR" not in r.stdout, name
            for i, ph in enumerate(phases):
                best = max(rates[5 * i:5 * i + 5])
                out[f"{name}_{ph}"] = round(best * 1048576 / 1e9, 4)
    return out


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

    rec = {
        "note": "native C++ host codec (slot-direct/fused AVX2 decode r4 + "
                "AVX2/reciprocal encode r4), book1, N=1024/lps=128; host "
                "throughput swings ~±30% between sessions -- compare only "
                "same-run pairs",
        "rows": rows}
    if "--with-reference" in sys.argv:
        ref = bench_reference()
        rec["reference_same_session_gbs"] = ref
        print("reference (same session, best-of-5):", flush=True)
        for k in sorted(ref):
            print(f"  {k:14s} {ref[k]:6.3f} GB/s", flush=True)
    out_path = next((a for a in sys.argv[1:] if not a.startswith("-")),
                    None)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
