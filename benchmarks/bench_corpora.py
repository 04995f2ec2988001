"""Decode throughput across data distributions (entropy robustness).

The monotone window fetch costs the same regardless of renorm density, so
decode speed should be nearly flat from near-zero-entropy to random bytes
-- unlike sweep-based designs whose stream routing scales with consumption.
Run: `python benchmarks/bench_corpora.py [word|alias] [out.json]`
(default word; alias = the r3 headline variant with the 6-row tables).
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
    from ryg_rans_tpu.ops import byte_tpu, word_tpu

    alias = len(sys.argv) > 1 and sys.argv[1] == "alias"

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    R, NB, BS = 128, 32, 1 << 19  # tuned r2 shape
    N = R * 128
    SYMS = NB * BS
    rng = np.random.default_rng(1)

    corpora = {
        "book1 (4.53 b/B)": np.tile(book1, (SYMS // book1.size) + 1)[:SYMS],
        "random (8.00 b/B)": rng.integers(0, 256, SYMS, dtype=np.uint8),
        "gaussian (~5.6 b/B)": rng.normal(128, 12, SYMS).clip(0, 255)
        .astype(np.uint8),
        "skewed (~0.7 b/B)": np.where(rng.random(SYMS) < 0.03,
                                      rng.integers(1, 256, SYMS),
                                      0).astype(np.uint8),
    }
    cfg = RansConfig(variant=Variant.ALIAS if alias else Variant.WORD,
                     prob_bits=16 if alias else 12, n_lanes=N,
                     lanes_per_stream=N, block_symbols=BS)
    T4 = BS // N // 4

    rows = []
    for name, data in corpora.items():
        freqs, cum = stats.build_model(data, cfg.prob_bits)
        if alias:
            tabs = byte_tpu.dec_tables(cfg, freqs, cum)
            blocks, _ = byte_tpu.encode(cfg, data, freqs, cum,
                                        interpret=False)
            cap = byte_tpu.decode_cap_rows(max(b.size for b in blocks), R)
            dec_fn = lambda x0, st: byte_tpu.decode_blocks(
                tabs, x0, st, T4=T4, R=R, sb=cfg.prob_bits, cap_rows=cap,
                n_blocks=NB, alias=True, ilp=2)
            prep = byte_tpu.prep_decode
        else:
            s4, fc = word_tpu.pack_dec_rows2(freqs, cum, cfg.prob_bits)
            sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
            blocks, _ = word_tpu.encode(cfg, data, freqs, cum,
                                        interpret=False)
            cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
            dec_fn = lambda x0, st, _s=sym4, _f=fcr, _c=cap:                 word_tpu.decode_blocks(_s, _f, x0, st, T4=T4, R=R,
                                       sb=cfg.prob_bits, cap_rows=_c,
                                       n_blocks=NB, ilp=2)
            prep = word_tpu.prep_decode
        buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b.astype(np.int32)
        x0, st = prep(jnp.asarray(buf), R, cap, NB)
        jax.block_until_ready(st)

        out = dec_fn(x0, st)
        ok = np.array_equal(
            np.asarray(word_tpu.unpack_symbols(out, T4, R, NB)), data)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(x0, st, reps: int):
            def one(c, i):
                x0c = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                return c ^ dec_fn(x0c, st)[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        run(2), run(10)
        a = min(run(2) for _ in range(3))
        b = min(run(10) for _ in range(3))
        gbs = SYMS / ((b - a) / 8) / 1e9
        wsz = 1 if alias else 2
        payload = sum(bb.size * wsz for bb in blocks)
        print(f"{name:22s} decode {gbs:6.3f} GB/s  payload {payload / 2**20:6.2f}"
              f" MiB  roundtrip={'ok' if ok else 'FAIL'}", flush=True)
        rows.append({"corpus": name, "decode_gbs": round(gbs, 3),
                     "payload_bytes": payload, "roundtrip_ok": bool(ok)})

    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump({"variant": cfg.variant.name,
                       "prob_bits": cfg.prob_bits,
                       "shape": {"R": R, "n_blocks": NB,
                                 "block_symbols": BS},
                       "rows": rows}, f, indent=1)
        print(f"wrote {sys.argv[2]}", flush=True)


if __name__ == "__main__":
    main()
