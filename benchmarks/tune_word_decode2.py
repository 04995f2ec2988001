"""Phase-2 tuning: large R and block sizes around the phase-1 winner
(R=64, groups=1). Run: `python benchmarks/tune_word_decode2.py`."""

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
    for R, BS_log in ((64, 19), (64, 20), (128, 19), (128, 20), (256, 20)):
        BS = 1 << BS_log
        N = R * 128
        if BS // N // 4 < 1:
            continue
        NB = max(1, (1 << 24) // BS)  # ~16.8M symbols total
        SYMS = NB * BS
        data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
        freqs, cum = stats.build_model(data, 12)
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
        del spk, emit, xf, words

        for wf in (0, R // 8, 3 * R // 16, 5 * R // 16):
            try:
                out = word_tpu.decode_blocks(sym4, fcr, x0, st, T4=T4, R=R,
                                             sb=12, cap_rows=cap_rows,
                                             n_blocks=NB, wfast=wf)
                dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
                ok = np.array_equal(dec, data)
            except Exception as e:  # VMEM overflow etc.
                print(f"R={R} BS=2^{BS_log} wfast={wf}: {type(e).__name__}",
                      flush=True)
                continue

            @functools.partial(jax.jit, static_argnames=("reps",))
            def dec_many(x0, st, reps: int, _w=wf):
                def one(c, i):
                    x0k = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                    out = word_tpu.decode_blocks(
                        sym4, fcr, x0k, st, T4=T4, R=R, sb=12,
                        cap_rows=cap_rows, n_blocks=NB, wfast=_w)
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

            lo, hi = 2, 10
            run(lo); run(hi)
            a = min(run(lo) for _ in range(4))
            b = min(run(hi) for _ in range(4))
            gbs = SYMS / ((b - a) / (hi - lo)) / 1e9
            results.append((R, BS_log, wf, ok, gbs))
            print(f"R={R:3d} BS=2^{BS_log} wfast={wf:2d} ok={ok} "
                  f"{gbs:7.3f} GB/s", flush=True)

    best = max(results, key=lambda r: r[4] if r[3] else 0)
    print("\nbest:", best)


if __name__ == "__main__":
    main()
