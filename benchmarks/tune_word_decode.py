"""Tuning sweep for the WORD decode kernel on real TPU (merges the former
phase-1/phase-2 scripts).

Measures dispatch-slope throughput (bench.py methodology) across
(R lane-rows, block size, ilp block interleave, groups unroll) combos,
correctness-gated.  Run on a chip: `python benchmarks/tune_word_decode.py`.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (R, log2 block_symbols, ilp, groups) combos to sweep
COMBOS = [
    (64, 19, 2, 1),   # shipped default
    (64, 19, 4, 1),
    (64, 20, 2, 1),
    (64, 19, 2, 2),
    (128, 19, 2, 1),
    (128, 20, 2, 1),
    (32, 19, 2, 1),
    (32, 19, 4, 1),
]


def main():
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import word_tpu

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    results = []
    for R, bs_log, ilp, groups in COMBOS:
        BS = 1 << bs_log
        N = R * 128
        T4 = BS // N // 4
        if T4 < 1 or T4 % groups:
            continue
        NB = max(ilp, (1 << 24) // BS)  # ~16.8M symbols total
        SYMS = NB * BS
        data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
        cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=N,
                         block_symbols=BS)
        freqs, cum = stats.build_model(data, 12)
        enc = jnp.asarray(word_tpu.pack_enc_rows(freqs, cum, 12))
        s4, fc = word_tpu.pack_dec_rows2(freqs, cum, 12)
        sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
        spk = word_tpu.pack_symbols(jnp.asarray(data), T4, R, NB)
        emit, xf = word_tpu.encode_blocks(enc, spk, T4=T4, R=R, sb=12,
                                          n_blocks=NB, ilp=1)
        words, nw = word_tpu.compact_emissions(emit, xf, BS, NB)
        cap_rows = word_tpu.decode_cap_rows(int(np.max(np.asarray(nw))), R)
        x0, st = word_tpu.prep_decode(words, R, cap_rows, NB)
        jax.block_until_ready(st)
        del spk, emit, xf, words

        try:
            out = word_tpu.decode_blocks(sym4, fcr, x0, st, T4=T4, R=R,
                                         sb=12, cap_rows=cap_rows,
                                         n_blocks=NB, groups=groups, ilp=ilp)
            dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
            ok = np.array_equal(dec, data)
        except Exception as e:
            print(f"R={R:3d} BS=2^{bs_log} ilp={ilp} groups={groups} "
                  f"FAIL {type(e).__name__}", flush=True)
            continue

        @functools.partial(jax.jit, static_argnames=("reps",))
        def dec_many(x0, st, reps: int, _g=groups, _i=ilp, _T4=T4, _R=R,
                     _c=cap_rows, _n=NB):
            def one(c, i):
                x0k = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                out = word_tpu.decode_blocks(
                    sym4, fcr, x0k, st, T4=_T4, R=_R, sb=12, cap_rows=_c,
                    n_blocks=_n, groups=_g, ilp=_i)
                return c ^ out[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = dec_many(x0, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = dec_many(x0, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        lo, hi = 2, 14
        run(lo), run(hi)
        a = min(run(lo) for _ in range(5))
        b = min(run(hi) for _ in range(5))
        gbs = SYMS / ((b - a) / (hi - lo)) / 1e9
        results.append((R, bs_log, ilp, groups, ok, gbs))
        print(f"R={R:3d} BS=2^{bs_log} ilp={ilp} groups={groups} "
              f"ok={ok} {gbs:7.3f} GB/s", flush=True)

    if results:
        best = max(results, key=lambda r: r[5] if r[4] else 0)
        print("\nbest:", best)


if __name__ == "__main__":
    main()
