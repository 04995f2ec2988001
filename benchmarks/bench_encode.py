"""Per-variant dense-encode kernel throughput on real TPU (dispatch slope).

Measures the Pallas encode kernel alone (the XLA compaction pass is a
separate, bandwidth-bound cost shared by all variants).  Run from the repo
root: `python benchmarks/bench_encode.py`.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu.config import DEFAULT_PROB_BITS, RansConfig, Variant
    from ryg_rans_tpu.ops import byte_tpu, rans64_tpu, word_tpu
    from ryg_rans_tpu.models import stats

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    # R=128 fastest for every variant (r2 sweep, docs/DESIGN.md)
    R, NB, BS = 128, 32, 1 << 19
    N = R * 128
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]

    def slope(step_fn, spk):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(spk, reps: int):
            def one(c, i):
                s = jnp.where(c == jnp.int32(123456789), spk ^ 1, spk)
                out = step_fn(s)
                return c ^ out[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(spk, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(spk, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        # encode dispatches are ~100us-1ms: use wide rep counts so the
        # slope dwarfs tunnel jitter (negative/absurd slopes otherwise)
        run(8), run(40)
        a = min(run(8) for _ in range(5))
        b = min(run(40) for _ in range(5))
        return SYMS / ((b - a) / 32) / 1e9

    T4 = BS // N // 4
    rows = []
    for variant in (Variant.WORD, Variant.BYTE, Variant.ALIAS,
                    Variant.RANS64):
        pb = min(DEFAULT_PROB_BITS[variant], 15) \
            if variant == Variant.RANS64 else DEFAULT_PROB_BITS[variant]
        cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=N,
                         block_symbols=BS)
        freqs, cum = stats.build_model(data, pb)
        spk = word_tpu.pack_symbols(jnp.asarray(data), T4, R, NB)
        if variant == Variant.WORD:
            enc = jnp.asarray(word_tpu.pack_enc_rows(freqs, cum, pb))
            fn = lambda s: word_tpu.encode_blocks(
                enc, s, T4=T4, R=R, sb=pb, n_blocks=NB, ilp=2)[1]
        elif variant in (Variant.BYTE, Variant.ALIAS):
            tabs = byte_tpu.enc_tables(cfg, freqs, cum)
            al = variant == Variant.ALIAS
            fn = lambda s, _t=tabs, _a=al: byte_tpu.encode_blocks(
                _t, s, T4=T4, R=R, sb=pb, n_blocks=NB, alias=_a, ilp=2)[1]
        else:
            enc = jnp.asarray(rans64_tpu.pack_enc_tables(freqs, cum))
            fn = lambda s: rans64_tpu.encode_blocks(
                enc, s, T4=T4, R=R, sb=pb, n_blocks=NB, ilp=2)[2]
        gbs = slope(fn, spk)
        print(f"{variant.name:6s} pb={pb:2d} encode {gbs:6.2f} GB/s "
              f"(dense kernel, ilp=2)", flush=True)
        rows.append({"variant": variant.name, "prob_bits": pb,
                     "encode_kernel_gbs": round(gbs, 3)})
        if variant == Variant.ALIAS:
            # r4 A/B: per-symbol seeded bisect (pack_alias_seed) vs the
            # hoisted-constant cascade (VERDICT r3 task 5)
            tabs3 = byte_tpu.enc_tables(cfg, freqs, cum, seed_bisect=True)
            if len(tabs3) == 3:
                fn_sd = lambda s, _t=tabs3: byte_tpu.encode_blocks(
                    _t, s, T4=T4, R=R, sb=pb, n_blocks=NB, alias=True,
                    ilp=2, seed_bisect=True)[1]
                gbs_sd = slope(fn_sd, spk)
                print(f"ALIAS  pb={pb:2d} encode {gbs_sd:6.2f} GB/s "
                      f"(seeded bisect A/B)", flush=True)
                rows.append({"variant": "ALIAS_seeded", "prob_bits": pb,
                             "encode_kernel_gbs": round(gbs_sd, 3)})

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"shape": {"R": R, "n_blocks": NB,
                                 "block_symbols": BS},
                       "note": ("dense Pallas encode kernel only; the "
                                "e2e encode-to-container number lives in "
                                "benchmarks/bench_e2e.py output"),
                       "rows": rows}, f, indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
