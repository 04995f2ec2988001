"""Block-parallel scaling report (SURVEY north star: >=80% linear at
1 chip / 1 host / N hosts).

Multi-chip hardware is not attachable in this environment (one v5e chip via
a remote tunnel; the host has ONE CPU core -- `nproc` = 1).  That makes
naive wall-clock "scaling" on the 8-device virtual CPU mesh meaningless:
eight virtual devices time-share one core, so wall time cannot drop no
matter how good the parallel decomposition is (this is what r2's 66.9%
"efficiency" was actually measuring).  This report therefore separates what
IS measurable here:

* ``grid``  (real chip): block-parallelism curve on one chip -- n_blocks
  1..32 at fixed block size, the single-chip face of the same data-parallel
  decomposition that scales across chips.
* ``mesh-weak`` (virtual CPU mesh): the r2-style weak-scaling curve
  (per-device work constant), kept for continuity; on a 1-core host its
  ceiling is flat wall time == 1/N "efficiency", so it bounds overhead,
  not speedup.
* ``mesh-conserve`` (virtual CPU mesh): work-conservation check -- TOTAL
  work constant while devices grow.  On one core, a perfectly
  communication-free sharded program keeps wall time flat; efficiency =
  T(1 dev)/T(N dev).  This isolates the algorithmic overhead of the
  shard_map decomposition from host contention.
* ``multihost``: the 2-OS-process DCN-gather path
  (parallel/multihost.py), timed end-to-end (both processes share the one
  core; the number bounds overhead like mesh-conserve).

Run `python benchmarks/scaling.py all SCALING.json` to produce the full
artifact (spawns CPU-mesh subprocesses; needs the TPU for ``grid``).
"""

import functools
import json
import os
import pathlib
import socket
import subprocess
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _slope(run, lo, hi, best_of=4):
    run(lo), run(hi)
    a = min(run(lo) for _ in range(best_of))
    b = min(run(hi) for _ in range(best_of))
    return (b - a) / (hi - lo)


def _decode_timer(cfg, data, freqs, cum, interpret):
    """Build a slope-timed decode closure for one shape; returns seconds
    per full-corpus decode."""
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu.ops import word_tpu

    R = cfg.n_lanes // 128
    BS = cfg.block_symbols
    NB = data.size // BS
    T4 = BS // cfg.n_lanes // 4
    s4, fc = word_tpu.pack_dec_rows2(freqs, cum, cfg.prob_bits)
    sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
    blocks, _ = word_tpu.encode(cfg, data, freqs, cum, interpret=interpret)
    cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
    buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
    for i, b in enumerate(blocks):
        buf[i, :b.size] = b.astype(np.int32)
    x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
    ilp = 2 if NB % 2 == 0 else 1

    def fn(x0, st):
        return word_tpu.decode_blocks(sym4, fcr, x0, st, T4=T4, R=R,
                                      sb=cfg.prob_bits, cap_rows=cap,
                                      n_blocks=NB, interpret=interpret,
                                      ilp=ilp)

    out = fn(x0, st)
    dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
    assert np.array_equal(dec, data), "round-trip failed"

    @functools.partial(jax.jit, static_argnames=("reps",))
    def many(x0, st, reps: int):
        def one(c, i):
            x0c = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
            return c ^ fn(x0c, st)[0, 0], None
        c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
        return c

    def run(reps):
        r = many(x0, st, reps)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = many(x0, st, reps)
        jax.block_until_ready(r)
        return time.perf_counter() - t0

    return run


def mode_grid():
    """Real-chip block-parallel curve: n_blocks 1..32, fixed 2^21-symbol
    blocks (the single-chip face of chip-level data parallelism)."""
    import jax

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    interpret = jax.default_backend() == "cpu"
    BS, R = 1 << 21, 128
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=R * 128,
                     block_symbols=BS)
    records = []
    for NB in (1, 2, 4, 8, 16, 32):
        SYMS = NB * BS
        data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
        freqs, cum = stats.build_model(data, 12)
        run = _decode_timer(cfg, data, freqs, cum, interpret)
        sec = _slope(run, 8, 40)
        gbs = SYMS / sec / 1e9
        records.append({"n_blocks": NB, "decode_gbs": round(gbs, 3)})
        print(f"grid n_blocks={NB:3d}: {gbs:8.3f} GB/s", flush=True)
    # one chip is a single saturated resource: the success criterion is
    # FLAT throughput as blocks grow (block count only changes how work is
    # fed, total rate should hold at the chip's peak)
    peak = max(r["decode_gbs"] for r in records)
    for r in records:
        r["vs_peak_pct"] = round(100 * r["decode_gbs"] / peak, 1)
    return records


def _mesh_records(weak: bool):
    """Virtual-CPU-mesh curves (weak or work-conserving strong)."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jax.sharding import PartitionSpec as P

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import word_tpu
    from ryg_rans_tpu.parallel import mesh as pmesh

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    n_avail = len(jax.devices())
    interpret = jax.default_backend() == "cpu"
    R, BS = 2, 4096
    N = R * 128
    total_blocks = 8
    records = []
    base_sec = None
    for ndev in [d for d in (1, 2, 4, 8) if d <= n_avail]:
        NB = total_blocks * (ndev if weak else 1)
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

        sec = _slope(run, 1, 5, best_of=3)
        if base_sec is None:
            base_sec = sec
        if weak:
            # total work grows with ndev on ONE shared core, so normalize
            # per unit of work: 100% = wall time grows exactly with work
            # (zero decomposition overhead); >100% = batching amortizes
            eff = base_sec * ndev / sec * 100
        else:
            # total work fixed: 100% = flat wall time = zero sharding
            # overhead on the shared core
            eff = base_sec / sec * 100
        records.append({"devices": ndev, "roundtrip_ok": bool(ok),
                        "seconds_per_pass": round(sec, 4),
                        "efficiency_pct": round(eff, 1)})
        print(f"{'weak' if weak else 'conserve'} devices={ndev}: "
              f"{sec:.4f}s eff={eff:.1f}% rt={'ok' if ok else 'FAIL'}",
              flush=True)
    return records


def mode_mesh_overhead():
    """Real-chip bound on the shard_map mesh path's per-chip overhead
    (r5 VERDICT #6): the same blocks decoded through
    parallel.mesh.decode_blocks_sharded on a ONE-device mesh vs the raw
    word_tpu.decode_blocks call, same session, same chip, headline-class
    shape.  This is the measurable half of the >=80%-linear north star
    with one chip: cross-chip scaling is communication-free by
    construction (zero collectives in the hot loop), so per-chip mesh
    overhead is the only term a second chip would add."""
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats
    from ryg_rans_tpu.ops import word_tpu
    from ryg_rans_tpu.parallel import mesh as pmesh

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)
    interpret = jax.default_backend() == "cpu"
    BS, R, NB = 1 << 21, 128, 16
    N = R * 128
    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=N,
                     lanes_per_stream=N, block_symbols=BS)
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
    freqs, cum = stats.build_model(data, 12)

    s4, fc = word_tpu.pack_dec_rows2(freqs, cum, 12)
    sym4, fcr = jnp.asarray(s4), jnp.asarray(fc)
    blocks, _ = word_tpu.encode(cfg, data, freqs, cum, interpret=interpret)
    cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
    buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
    for i, b in enumerate(blocks):
        buf[i, :b.size] = b.astype(np.int32)
    x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)
    T4 = BS // N // 4
    mesh = pmesh.make_mesh(1)  # the one real chip

    def raw(x0c, st):
        return word_tpu.decode_blocks(sym4, fcr, x0c, st, T4=T4, R=R,
                                      sb=12, cap_rows=cap, n_blocks=NB,
                                      interpret=interpret, ilp=2)

    def meshed(x0c, st):
        return pmesh.decode_blocks_sharded(
            mesh, sym4, fcr, x0c, st, T4=T4, R=R, sb=12, cap_rows=cap,
            n_blocks=NB, interpret=interpret)

    out = {}
    for name, fn in (("raw_kernel", raw), ("mesh_shard_map", meshed)):
        spk = fn(x0, st)
        dec = np.asarray(word_tpu.unpack_symbols(spk, T4, R, NB))
        assert np.array_equal(dec, data), f"round-trip failed ({name})"

        @functools.partial(jax.jit, static_argnames=("reps",))
        def many(x0, st, reps: int, fn=fn):
            def one(c, i):
                x0c = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
                return c ^ fn(x0c, st)[0, 0], None
            c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
            return c

        def run(reps):
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = many(x0, st, reps)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        sec = _slope(run, 8, 40)
        out[name] = {"decode_gbs": round(SYMS / sec / 1e9, 3),
                     "seconds_per_pass": round(sec, 5)}
        print(f"mesh-overhead {name}: {SYMS / sec / 1e9:.3f} GB/s",
              flush=True)
    t_raw = out["raw_kernel"]["seconds_per_pass"]
    t_mesh = out["mesh_shard_map"]["seconds_per_pass"]
    out["mesh_overhead_pct"] = round(100 * (t_mesh - t_raw) / t_raw, 2)
    print(f"mesh_overhead_pct = {out['mesh_overhead_pct']}%", flush=True)
    return out


_MH_WORKER = r'''
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=n, process_id=pid)
import numpy as np
from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.parallel import multihost

cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=128,
                 lanes_per_stream=128, block_symbols=2048)
rng = np.random.default_rng(7)
data = rng.integers(0, 256, 8 * cfg.block_symbols, dtype=np.uint8)
freqs, cum = stats.build_model(data, cfg.prob_bits)
payloads = multihost.compress_multihost(data, cfg, freqs, cum,
                                        interpret=True)
# warm, then time 3 full decompress passes (wall clock across both procs)
multihost.decompress_multihost(payloads, cfg, data.size, freqs, cum,
                               interpret=True)
t0 = time.perf_counter()
for _ in range(3):
    out = multihost.decompress_multihost(payloads, cfg, data.size, freqs,
                                         cum, interpret=True)
dt = (time.perf_counter() - t0) / 3
assert np.array_equal(out[:data.size], data)
print(f"MHOK {{pid}} {{data.size / dt / 1e6:.3f}}", flush=True)
'''


def mode_multihost():
    """2-OS-process DCN-gather throughput (localhost, 1 shared core)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    tmp = pathlib.Path("/tmp/scaling_mh_worker.py")
    tmp.write_text(_MH_WORKER.format(repo=_ROOT))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    procs = [subprocess.Popen(
        [sys.executable, str(tmp), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    mbps = []
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith(f"MHOK {i}")]
        assert line, f"worker {i} failed:\n{out[-2000:]}"
        mbps.append(float(line[0].split()[2]))
    print(f"multihost 2-proc decode: {mbps} MB/s", flush=True)
    return {"processes": 2, "roundtrip_ok": True,
            "decode_mbps_per_proc": mbps}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    if mode == "grid":
        result = mode_grid()
    elif mode == "mesh-overhead":
        result = mode_mesh_overhead()
    elif mode == "mesh-weak":
        result = _mesh_records(weak=True)
    elif mode == "mesh-conserve":
        result = _mesh_records(weak=False)
    elif mode == "multihost":
        result = mode_multihost()
    elif mode == "all":
        # r5: the virtual-mesh "efficiency" curves are dropped from the
        # artifact -- on a 1-core host they carry no information (r4
        # VERDICT weak #5); the modes remain runnable by name.  The
        # real-chip mesh-overhead bound replaces them: cross-chip scaling
        # is communication-free by construction, so per-chip shard_map
        # overhead is the only term a second chip would add.
        result = {
            "note": ("grid = real-chip block-parallel curve (success = "
                     "flat at peak); mesh_overhead = same blocks through "
                     "the shard_map mesh path vs the raw kernel on the "
                     "real chip (target <= 10%); multihost = 2-OS-process "
                     "DCN gather on the 1-core host (bounds overhead)."),
            "host_cores": os.cpu_count(),
            "grid_chip": mode_grid(),
            "mesh_overhead_chip": mode_mesh_overhead(),
            "multihost_2proc": mode_multihost(),
        }
    else:
        raise SystemExit(f"unknown mode {mode}")

    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
