"""RANS64 decode latency roofline by stage ablation (r5 VERDICT #4).

Times the full wide-path decode kernel and three ablated variants (each
pipeline stage stubbed with dependency-preserving cheap math -- the
``ablate`` hook in ops/rans64_tpu._decode_kernel) in ONE session, so the
per-stage cost falls out by subtraction with the tunnel weather held
constant:

  stage cost ~= T(full) - T(ablate=stage)

Also re-measures hoist4 (4th hoisted bisect level) on the r5 track2
kernel.  Ablated kernels do NOT round-trip (the full kernel is gated).

Run: `python benchmarks/roofline_r64.py [out.json] [pb]`.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.ops import rans64_tpu, word_tpu


def main():
    out_path = next((a for a in sys.argv[1:] if not a.isdigit()), None)
    pb = next((int(a) for a in sys.argv[1:] if a.isdigit()), 31)
    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    R, NB, BS = 128, 24, 1 << 19
    N = R * 128
    SYMS = NB * BS
    ILP = 4
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
    cfg = RansConfig(variant=Variant.RANS64, prob_bits=pb, n_lanes=N,
                     lanes_per_stream=N, block_symbols=BS)
    freqs, cum = stats.build_model(data, pb)
    s4, fc = rans64_tpu.pack_dec_tables(freqs, cum, pb)
    tabs = (jnp.asarray(s4) if s4 is not None else None, jnp.asarray(fc))
    blocks, _ = rans64_tpu.encode(cfg, data, freqs, cum, interpret=False)
    cap = rans64_tpu.decode_cap_rows(max(b.size for b in blocks), R)
    buf = np.zeros((NB, max(b.size for b in blocks)), np.uint32)
    for i, b in enumerate(blocks):
        buf[i, :b.size] = b
    x0lo, x0hi, st = rans64_tpu.prep_decode(
        jnp.asarray(buf.view(np.int32)), R, cap, NB)
    T4 = BS // N // 4

    def slope(fn):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(a, b, st, reps: int):
            def one(c, i):
                a2 = jnp.where(c == jnp.int32(123456789), a ^ 1, a)
                out = fn(a2, b, st)
                return c ^ out[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0lo, x0hi, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0lo, x0hi, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        run(4), run(28)
        a = min(run(4) for _ in range(5))
        b = min(run(28) for _ in range(5))
        return (b - a) / 24

    def make(ablate="", hoist4=False):
        return lambda a, b, st: rans64_tpu.decode_blocks(
            *tabs, a, b, st, T4=T4, R=R, sb=pb, cap_rows=cap,
            n_blocks=NB, ilp=ILP, hoist4=hoist4, ablate=ablate)

    # correctness gate on the full kernel only
    out = make()(x0lo, x0hi, st)
    dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
    assert np.array_equal(dec, data), "full-kernel round-trip failed"

    rows = {}
    for name, fn in (("full", make()),
                     ("no_lookup", make("lookup")),
                     ("no_fetch", make("fetch")),
                     ("no_scan", make("scan")),
                     ("no_mul", make("mul")),
                     ("full_hoist4", make(hoist4=True))):
        sec = slope(fn)
        gbs = SYMS / sec / 1e9
        rows[name] = {"sec_per_pass": round(sec, 6),
                      "decode_gbs": round(gbs, 3)}
        print(f"{name:12s} {gbs:7.3f} GB/s  {sec*1e6:8.1f} us/pass",
              flush=True)

    t_full = rows["full"]["sec_per_pass"]
    n_steps = SYMS // (N * ILP) / ILP  # substeps per chain: T4*4 grid steps
    stages = {}
    for name, key in (("lookup", "no_lookup"), ("window_fetch", "no_fetch"),
                      ("renorm_scan_total", "no_scan"),
                      ("limb_mul", "no_mul")):
        dt = t_full - rows[key]["sec_per_pass"]
        stages[name] = {"sec": round(dt, 6),
                        "pct_of_full": round(100 * dt / t_full, 1)}
    rec = {"shape": {"R": R, "NB": NB, "BS": BS, "ilp": ILP, "pb": pb},
           "rows": rows, "stage_cost_by_subtraction": stages}
    print(json.dumps(rec["stage_cost_by_subtraction"]), flush=True)
    if out_path:
        json.dump(rec, open(out_path, "w"), indent=1)
        print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
