"""Per-variant decode throughput on real TPU (dispatch-slope method).

Prints one line per variant and writes a JSON artifact when given a path:
`python benchmarks/bench_variants.py [out.json]`.  The headline metric
stays in bench.py.
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
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import byte_tpu, rans64_tpu, word_tpu

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    # R=128 measured fastest for every variant (r2 sweep, docs/DESIGN.md);
    # NB=24 divides by 3 so RANS64 can run its preferred ilp=3 (r3)
    R, NB, BS = 128, 24, 1 << 19
    N = R * 128
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]

    def slope(fn, x0s, st):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(x0s, st, reps: int):
            def one(c, i):
                # carry-dependent (not constant-foldable) input defeats
                # loop-invariant hoisting of the decode (CLAUDE.md)
                moved = tuple(jnp.where(c == jnp.int32(123456789), x ^ 1, x)
                              for x in x0s)
                out = fn(moved, st)
                return c ^ out[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0s, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0s, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        # wide reps + best-of-5: narrow slopes occasionally read 2-3x high
        # on the shared tunnel (docs/DESIGN.md bench traps)
        run(4), run(28)
        a = min(run(4) for _ in range(5))
        b = min(run(28) for _ in range(5))
        return SYMS / ((b - a) / 24) / 1e9

    rows = []
    for variant, pb in ((Variant.WORD, DEFAULT_PROB_BITS[Variant.WORD]),
                        (Variant.BYTE, DEFAULT_PROB_BITS[Variant.BYTE]),
                        (Variant.ALIAS, DEFAULT_PROB_BITS[Variant.ALIAS]),
                        (Variant.RANS64, DEFAULT_PROB_BITS[Variant.RANS64]),
                        (Variant.RANS64, 31)):
        cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=N,
                         lanes_per_stream=N, block_symbols=BS)
        freqs, cum = stats.build_model(data, pb)

        if variant == Variant.WORD:
            s4, fc = word_tpu.pack_dec_rows2(freqs, cum, pb)
            tabs = (jnp.asarray(s4), jnp.asarray(fc))
            blocks, _ = word_tpu.encode(cfg, data, freqs, cum,
                                        interpret=False)
            cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
            buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
            for i, b in enumerate(blocks):
                buf[i, :b.size] = b.astype(np.int32)
            x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
            T4 = BS // N // 4
            # ilp=3 wins for WORD pb12 with the r5 byte-plane fetch
            # (15.59 vs 14.96, AB_BP_ALL_r05); pb11 prefers 2 (22.56)
            fn = lambda x0s, st: word_tpu.decode_blocks(
                *tabs, x0s[0], st, T4=T4, R=R, sb=pb, cap_rows=cap,
                n_blocks=NB, ilp=3 if NB % 3 == 0 else 2)
            x0s = (x0,)
        elif variant in (Variant.BYTE, Variant.ALIAS):
            tabs = byte_tpu.dec_tables(cfg, freqs, cum)
            blocks, _ = byte_tpu.encode(cfg, data, freqs, cum,
                                        interpret=False)
            cap = byte_tpu.decode_cap_rows(max(b.size for b in blocks), R)
            buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
            for i, b in enumerate(blocks):
                buf[i, :b.size] = b.astype(np.int32)
            x0, st = byte_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
            T4 = BS // N // 4
            alias = variant == Variant.ALIAS
            # BYTE and ALIAS both prefer ilp=3 with the r5 byte-plane
            # fetch (17.78 / 17.27 GB/s, AB_BP_ALL_r05)
            bilp = 3 if NB % 3 == 0 else 2
            fn = lambda x0s, st, _t=tabs, _a=alias, _i=bilp: \
                byte_tpu.decode_blocks(
                    _t, x0s[0], st, T4=T4, R=R, sb=pb, cap_rows=cap,
                    n_blocks=NB, alias=_a, ilp=_i)
            x0s = (x0,)
        else:
            s4, fc = rans64_tpu.pack_dec_tables(freqs, cum, pb)
            # pb > 16: no slot table, wide-fc bisect path (s4 is None)
            tabs = (jnp.asarray(s4) if s4 is not None else None,
                    jnp.asarray(fc))
            blocks, _ = rans64_tpu.encode(cfg, data, freqs, cum,
                                          interpret=False)
            cap = rans64_tpu.decode_cap_rows(max(b.size for b in blocks), R)
            buf = np.zeros((NB, max(b.size for b in blocks)), np.uint32)
            for i, b in enumerate(blocks):
                buf[i, :b.size] = b
            x0lo, x0hi, st = rans64_tpu.prep_decode(
                jnp.asarray(buf.view(np.int32)), R, cap, NB)
            T4 = BS // N // 4
            # deeper block-ILP for RANS64: its longer limb chain keeps
            # gaining past 2 (r3: ilp=3 +5%; r4 AB_BISECT: ilp=4 10.05
            # vs 9.90 GB/s at pb14 with the signed-compare bisect)
            fn = lambda x0s, st, _pb=pb, _cap=cap: rans64_tpu.decode_blocks(
                *tabs, x0s[0], x0s[1], st, T4=T4, R=R, sb=_pb, cap_rows=_cap,
                n_blocks=NB, ilp=4 if NB % 4 == 0 else 3)
            x0s = (x0lo, x0hi)

        # correctness gate
        out = fn(x0s, st)
        dec = np.asarray(word_tpu.unpack_symbols(out, BS // N // 4, R, NB))
        ok = np.array_equal(dec, data)
        gbs = slope(fn, x0s, st) if ok else 0.0
        payload = sum(b.size * b.dtype.itemsize for b in blocks)
        print(f"{variant.name:6s} pb={pb:2d} decode {gbs:6.3f} GB/s  "
              f"payload {payload} B  roundtrip={'ok' if ok else 'FAIL'}",
              flush=True)
        rows.append({"variant": variant.name, "prob_bits": pb,
                     "decode_gbs": round(gbs, 3), "payload_bytes": payload,
                     "roundtrip_ok": bool(ok)})

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"shape": {"R": R, "n_blocks": NB,
                                 "block_symbols": BS}, "rows": rows}, f,
                      indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
