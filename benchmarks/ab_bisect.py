"""A/B the bisect-path decode changes on the real chip (r4).

Two lanes.py changes affect every bisect decode path (WORD/BYTE pb >= 14,
RANS64 all pb): signed compares instead of xor-biased unsigned ones
(pre-biased wide keys), and an optional hoisted stride-16 level
(``hoist4``, one fewer dependent gather per symbol lookup).  This probes
decode throughput per (variant, prob_bits, ilp, hoist4) at the
bench_variants shape; byte-exact round-trip gates every row.

Usage: python benchmarks/ab_bisect.py [out.json]
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

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import byte_tpu, rans64_tpu, word_tpu

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    R, NB, BS = 128, 24, 1 << 19
    N = R * 128
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]

    def slope(fn, x0s, st):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(x0s, st, reps: int):
            def one(c, i):
                moved = tuple(jnp.where(c == jnp.int32(123456789), x ^ 1, x)
                              for x in x0s)
                return c ^ fn(moved, st)[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0s, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0s, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        run(4), run(28)
        a = min(run(4) for _ in range(5))
        b = min(run(28) for _ in range(5))
        return SYMS / ((b - a) / 24) / 1e9

    # (variant, pb, ilp, hoist4); override via argv ints after out.json:
    # `ab_bisect.py out.json ilp3` runs the block-ILP depth sweep instead
    if "ilp3" in sys.argv:
        cands = [
            (Variant.WORD, 12, 2, False), (Variant.WORD, 12, 3, False),
            (Variant.BYTE, 14, 2, False), (Variant.BYTE, 14, 3, False),
            (Variant.RANS64, 31, 4, False),
        ]
    else:
        cands = [
            (Variant.RANS64, 14, 3, False), (Variant.RANS64, 14, 3, True),
            (Variant.RANS64, 14, 4, False), (Variant.RANS64, 14, 4, True),
            (Variant.RANS64, 31, 3, False), (Variant.RANS64, 31, 3, True),
            (Variant.BYTE, 14, 2, False), (Variant.BYTE, 14, 2, True),
            (Variant.WORD, 14, 2, True),
        ]
    prepped = {}
    rows = []
    for variant, pb, ilp, hoist4 in cands:
        cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=N,
                         lanes_per_stream=N, block_symbols=BS)
        T4 = BS // N // 4
        key = (variant, pb)
        if key not in prepped:
            freqs, cum = stats.build_model(data, pb)
            if variant == Variant.WORD:
                s4, fcw = word_tpu.pack_dec_rows2(freqs, cum, pb)
                tabs = (jnp.asarray(s4), jnp.asarray(fcw))
                blocks, _ = word_tpu.encode(cfg, data, freqs, cum,
                                            interpret=False)
                cap = word_tpu.decode_cap_rows(
                    max(b.size for b in blocks), R)
                buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
                for i, b in enumerate(blocks):
                    buf[i, :b.size] = b.astype(np.int32)
                x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
                prepped[key] = (tabs, (x0,), st, cap)
            elif variant == Variant.BYTE:
                tabs = byte_tpu.dec_tables(cfg, freqs, cum)
                blocks, _ = byte_tpu.encode(cfg, data, freqs, cum,
                                            interpret=False)
                cap = byte_tpu.decode_cap_rows(
                    max(b.size for b in blocks), R)
                buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
                for i, b in enumerate(blocks):
                    buf[i, :b.size] = b.astype(np.int32)
                x0, st = byte_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
                prepped[key] = (tabs, (x0,), st, cap)
            else:
                s4, fcw = rans64_tpu.pack_dec_tables(freqs, cum, pb)
                tabs = (jnp.asarray(s4) if s4 is not None else None,
                        jnp.asarray(fcw))
                blocks, _ = rans64_tpu.encode(cfg, data, freqs, cum,
                                              interpret=False)
                cap = rans64_tpu.decode_cap_rows(
                    max(b.size for b in blocks), R)
                buf = np.zeros((NB, max(b.size for b in blocks)), np.uint32)
                for i, b in enumerate(blocks):
                    buf[i, :b.size] = b
                x0lo, x0hi, st = rans64_tpu.prep_decode(
                    jnp.asarray(buf.view(np.int32)), R, cap, NB)
                prepped[key] = (tabs, (x0lo, x0hi), st, cap)
        tabs, x0s, st, cap = prepped[key]

        if variant == Variant.WORD:
            fn = lambda x0s, st, _i=ilp, _h=hoist4: word_tpu.decode_blocks(
                *tabs, x0s[0], st, T4=T4, R=R, sb=pb, cap_rows=cap,
                n_blocks=NB, ilp=_i, hoist4=_h)
        elif variant == Variant.BYTE:
            fn = lambda x0s, st, _i=ilp, _h=hoist4: byte_tpu.decode_blocks(
                tabs, x0s[0], st, T4=T4, R=R, sb=pb, cap_rows=cap,
                n_blocks=NB, alias=False, ilp=_i, hoist4=_h)
        else:
            fn = lambda x0s, st, _i=ilp, _h=hoist4, _p=pb, _c=cap: \
                rans64_tpu.decode_blocks(
                    *tabs, x0s[0], x0s[1], st, T4=T4, R=R, sb=_p,
                    cap_rows=_c, n_blocks=NB, ilp=_i, hoist4=_h)

        out = fn(x0s, st)
        dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
        ok = np.array_equal(dec, data)
        gbs = slope(fn, x0s, st) if ok else 0.0
        print(f"{variant.name:6s} pb={pb:2d} ilp={ilp} "
              f"hoist4={int(hoist4)} decode {gbs:6.3f} GB/s "
              f"roundtrip={'ok' if ok else 'FAIL'}", flush=True)
        rows.append({"variant": variant.name, "prob_bits": pb, "ilp": ilp,
                     "hoist4": hoist4, "decode_gbs": round(gbs, 3),
                     "roundtrip_ok": bool(ok)})

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"shape": {"R": R, "n_blocks": NB,
                                 "block_symbols": BS}, "rows": rows}, f,
                      indent=1)
        print(f"wrote {sys.argv[1]}", flush=True)


if __name__ == "__main__":
    main()
