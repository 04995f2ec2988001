"""Block-parallel scaling report across the available device mesh.

Decodes the same per-device workload on 1..N devices and reports throughput
plus linear-scaling efficiency.  On a machine with one chip this prints the
1-device line only; on a pod slice it exercises ICI scale-out (the SURVEY
north-star target is >=80% linear at 1 chip / 1 host / N hosts).

Run: `python benchmarks/scaling.py` (add JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual-mesh logic
check; CPU timings are not meaningful).
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

    # the axon TPU plugin ignores JAX_PLATFORMS from the environment, so
    # honor a cpu request via jax.config before the backend initializes
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import word_tpu
    from ryg_rans_tpu.parallel import mesh as pmesh

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    n_avail = len(jax.devices())
    interpret = jax.default_backend() == "cpu"

    # flagship tuned shape (docs/DESIGN.md r2 sweep); overridable so the
    # virtual CPU mesh logic curve can run tiny interpret-mode shapes
    R = int(os.environ.get("SCALING_R", 128))
    BS = 1 << int(os.environ.get("SCALING_BS_LOG", 19))
    N = R * 128
    blocks_per_dev = int(os.environ.get("SCALING_BLOCKS_PER_DEV", 16))

    base_gbs = None
    records = []
    for ndev in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]:
        NB = blocks_per_dev * ndev
        SYMS = NB * BS
        data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
        freqs, cum = stats.build_model(data, 12)
        mesh = pmesh.make_mesh(ndev)
        cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=N,
                         lanes_per_stream=N, block_symbols=BS)
        out, (words, _) = pmesh.roundtrip_step(
            mesh, cfg, jnp.asarray(data), freqs, cum, interpret=interpret)
        ok = np.array_equal(np.asarray(out), data)

        s4, fc = word_tpu.pack_dec_rows2(freqs, cum, 12)
        sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
        T4 = BS // N // 4
        cap_rows = word_tpu.decode_cap_rows(2 * N + BS, R)

        from jax.sharding import NamedSharding, PartitionSpec as P
        per = NB // ndev

        def prep(w):
            return word_tpu.prep_decode(w, R, cap_rows, per)

        x0, st = pmesh.shard_map(prep, mesh, in_specs=P(pmesh.DATA_AXIS),
                                 out_specs=(P(pmesh.DATA_AXIS),
                                            P(pmesh.DATA_AXIS)))(words)
        jax.block_until_ready(st)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(x0, st, reps: int):
            def one(c, i):
                # carry-dependent input defeats loop-invariant hoisting
                x0c = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                o = pmesh.decode_blocks_sharded(
                    mesh, sym4, fcr, x0c, st, T4=T4, R=R, sb=12,
                    cap_rows=cap_rows, n_blocks=NB, interpret=interpret)
                return c ^ o[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        run(1), run(5)
        a = min(run(1) for _ in range(3))
        b = min(run(5) for _ in range(3))
        gbs = SYMS / ((b - a) / 4) / 1e9
        if base_gbs is None:
            base_gbs = gbs / ndev
        eff = gbs / (base_gbs * ndev) * 100
        print(f"devices={ndev:3d} roundtrip={'ok' if ok else 'FAIL'} "
              f"decode {gbs:8.3f} GB/s  efficiency {eff:5.1f}%", flush=True)
        records.append({"devices": ndev, "platform": jax.devices()[0].platform,
                        "roundtrip_ok": bool(ok), "decode_gbs": round(gbs, 4),
                        "efficiency_pct": round(eff, 2)})


    out = os.environ.get("SCALING_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
