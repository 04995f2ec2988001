"""End-to-end front-door throughput: what `rt.compress` / `rt.decompress`
actually deliver (VERDICT r2 tasks 4/5).

Unlike bench.py (kernel dispatch slope) this times the WHOLE pipeline by
wall clock: histogram + model build, host->device transfer, Pallas kernel,
compaction, device->host fetch, container assembly -- per call, best of 5,
like the reference harness (main.cpp:169-186).  On this machine the chip
sits behind a remote tunnel (~25ms/sync + PCIe-less transport), so these
numbers are a LOWER bound for a locally-attached TPU host; the kernel-rate
ceiling is bench.py's number.

Writes one JSON artifact with a row per (label, size): e2e compress GB/s,
e2e decompress GB/s, container ratio.  Run: `python benchmarks/bench_e2e.py
[out.json]`.
"""

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def bench_case(label, data, cfg=None, backend="tpu", reps=5):
    from ryg_rans_tpu import api

    data = np.asarray(data, np.uint8)
    blob = api.compress(data, cfg, backend=backend)   # warm/compile
    assert api.decompress(blob, backend=backend) == data.tobytes()

    enc = min(_timed(lambda: api.compress(data, cfg, backend=backend))
              for _ in range(reps))
    dec = min(_timed(lambda: api.decompress(blob, backend=backend))
              for _ in range(reps))
    row = {"case": label, "bytes": int(data.size),
           "container_bytes": len(blob),
           "bits_per_byte": round(8 * len(blob) / data.size, 4),
           "compress_gbs": round(data.size / enc / 1e9, 3),
           "decompress_gbs": round(data.size / dec / 1e9, 3),
           "backend": backend}
    print(json.dumps(row), flush=True)
    return row


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    from ryg_rans_tpu.config import RansConfig

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    big = np.tile(book1, (1 << 25) // book1.size + 1)[:1 << 25]

    rows = [
        # the default front door at two scales (RansConfig.auto shapes)
        bench_case("book1_auto", book1),
        bench_case("32MiB_auto", big),
        # the r2 fixed default, for comparison with what auto replaced
        bench_case("32MiB_legacy_default", big,
                   RansConfig()),
    ]
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _ROOT, "E2E_FRONTDOOR.json")
    with open(out, "w") as f:
        json.dump({"note": ("wall-clock per call incl. host<->device "
                            "transfer over the remote tunnel; kernel-rate "
                            "ceiling is bench.py"), "rows": rows}, f,
                  indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
