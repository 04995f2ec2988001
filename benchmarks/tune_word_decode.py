"""Tuning sweep for the WORD decode kernel on real TPU.

Measures the dispatch-slope throughput (bench.py methodology) across
(R lanes-rows, groups unroll, WFAST window span) and prints a table.
Run on a chip: `python benchmarks/tune_word_decode.py`.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import word_tpu

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)

    results = []
    for R in (16, 32, 64):
        NB = 1024 // R  # keep total symbols comparable (~16.8M)
        BS = 1 << 19
        N = R * 128
        SYMS = NB * BS
        cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=N,
                         lanes_per_stream=N, block_symbols=BS)
        data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
        freqs, cum = stats.build_model(data, cfg.prob_bits)
        enc_rows = jnp.asarray(word_tpu.pack_enc_rows(freqs, cum, 12))
        s4, fc = word_tpu.pack_dec_rows2(freqs, cum, 12)
        sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
        T4 = BS // N // 4

        spk = word_tpu.pack_symbols(jnp.asarray(data), T4, R, NB)
        emit, xf = word_tpu.encode_blocks(enc_rows, spk, T4=T4, R=R, sb=12,
                                          n_blocks=NB)
        words, nw = word_tpu.compact_emissions(emit, xf, BS, NB)
        cap_rows = word_tpu.decode_cap_rows(int(np.max(np.asarray(nw))), R)
        x0, st = word_tpu.prep_decode(words, R, cap_rows, NB)
        jax.block_until_ready(st)

        for groups in (1, 2, 4):
            if T4 % groups:
                continue
            for wf in (0, R // 8, R // 4, R // 2):
                if wf == 0 and groups == 1:
                    pass  # baseline config included
                wfast = wf

                @functools.partial(jax.jit, static_argnames=("reps",))
                def dec_many(x0, st, reps: int, _g=groups, _w=wfast):
                    def one(c, i):
                        x0k = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                        out = word_tpu.decode_blocks(
                            sym4, fcr, x0k, st, T4=T4, R=R, sb=12,
                            cap_rows=cap_rows, n_blocks=NB, groups=_g,
                            wfast=_w)
                        return c ^ out[0, 0], None
                    c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
                    return c

                # correctness first
                out = word_tpu.decode_blocks(sym4, fcr, x0, st, T4=T4, R=R,
                                             sb=12, cap_rows=cap_rows,
                                             n_blocks=NB, groups=groups,
                                             wfast=wfast)
                dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
                ok = np.array_equal(dec, data)

                def run(reps):
                    r = dec_many(x0, st, reps)
                    jax.block_until_ready(r)
                    t0 = time.perf_counter()
                    r = dec_many(x0, st, reps)
                    jax.block_until_ready(r)
                    return time.perf_counter() - t0

                lo, hi = 2, 10
                run(lo); run(hi)
                a = min(run(lo) for _ in range(3))
                b = min(run(hi) for _ in range(3))
                gbs = SYMS / ((b - a) / (hi - lo)) / 1e9
                results.append((R, groups, wfast, ok, gbs))
                print(f"R={R:3d} groups={groups} wfast={wfast:2d} "
                      f"ok={ok} {gbs:7.3f} GB/s", flush=True)

    best = max(results, key=lambda r: r[4] if r[3] else 0)
    print("\nbest:", best)


if __name__ == "__main__":
    main()
