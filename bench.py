"""Headline benchmark: best-variant rANS decode throughput per chip,
byte-exact, WITH the compression ratio of the very same operating point.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline",
"container_bytes", "bits_per_byte", "ratio_vs_reference"}.

Baseline: the reference's best published decode, 8-way SIMD interleaved
rans_word at 550.8 MB/s on an i7-2600K (README:112, BASELINE.md); ratio
reference: its 2-way interleaved rans_byte container, 435,117 B on book1 =
4.5276 bits/byte (README:62, size printed per run at main.cpp:252).

Methodology: the corpus is book1 tiled to 4 blocks x 2^23 symbols (33.6 MB)
so the chip runs at steady state; timing uses the slope between scan-chained
in-dispatch repetitions to exclude host/tunnel round-trip latency (the
reference likewise times only its codec loops, main.cpp:169-186); the scan
carry makes each repetition data-dependent so no dispatch is elided.
Decoded output is byte-compared against the input before timing; a
candidate that fails the round-trip scores 0.  The headline is the fastest
of ALIAS pb=16 (O(1) lookup in 6 gather rows -- r3 repack) and WORD pb=11
(4-row cum2sym), both at R=128 = 16384 lanes, at ONE shape that meets both
north-star halves simultaneously: 2^23-symbol blocks amortize the 64 KiB
flushed-lane-state head to 0.8% (the r2 shape, 2^19, paid 24% --
benchmarks/tune_blocksize.py sweep, docs/DESIGN.md), and the container is
produced by the real api.compress front door at exactly the benched
config.
"""

import functools
import json
import sys
import time


def _bench_variant(variant_name: str, pb: int, data, models, R: int,
                   NB: int, BS: int, slot_direct: bool = False,
                   ilp: int = 2):
    """models: {prob_bits: (freqs, cum)}; returns (GB/s, container_bytes)
    with GB/s 0.0 on round-trip mismatch.  slot_direct A/Bs the WORD
    one-level per-slot table (host_prep.pack_slot_direct, pb <= 12)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ryg_rans_tpu import api
    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.ops import byte_tpu, host_prep, word_tpu

    N = R * 128
    SYMS = NB * BS
    T4 = BS // N // 4
    variant = Variant[variant_name]
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=N,
                     block_symbols=BS)

    # ratio half of the north star: the real front door at the benched shape
    container_bytes = len(api.compress(data, cfg, backend="tpu"))

    if variant == Variant.WORD:
        s4, fc = word_tpu.pack_dec_rows2(models[pb][0], models[pb][1], pb)
        if slot_direct:
            s4 = host_prep.pack_slot_direct(models[pb][0], models[pb][1], pb)
        tabs = (jnp.asarray(s4), jnp.asarray(fc))
        blocks, _ = word_tpu.encode(cfg, data, *models[pb], interpret=False)
        cap = word_tpu.decode_cap_rows(max(b.size for b in blocks), R)
        buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b.astype(np.int32)
        x0, st = word_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)

        def fn(x0, st):
            return word_tpu.decode_blocks(*tabs, x0, st, T4=T4, R=R, sb=pb,
                                          cap_rows=cap, n_blocks=NB,
                                          ilp=ilp,
                                          slot_direct=slot_direct)
    else:
        tabs = byte_tpu.dec_tables(cfg, *models[pb])
        blocks, _ = byte_tpu.encode(cfg, data, *models[pb], interpret=False)
        cap = byte_tpu.decode_cap_rows(max(b.size for b in blocks), R)
        buf = np.zeros((NB, max(b.size for b in blocks)), np.int32)
        for i, b in enumerate(blocks):
            buf[i, :b.size] = b.astype(np.int32)
        x0, st = byte_tpu.prep_decode(jnp.asarray(buf), R, cap, NB)

        def fn(x0, st):
            return byte_tpu.decode_blocks(tabs, x0, st, T4=T4, R=R, sb=pb,
                                          cap_rows=cap, n_blocks=NB,
                                          alias=variant == Variant.ALIAS,
                                          ilp=ilp)

    # correctness gate: full byte-exact round-trip before any timing
    out = fn(x0, st)
    dec = np.asarray(word_tpu.unpack_symbols(out, T4, R, NB))
    if not np.array_equal(dec, data):
        print(f"ERROR: {variant_name} round-trip mismatch", file=sys.stderr)
        return 0.0, container_bytes

    @functools.partial(jax.jit, static_argnames=("reps",))
    def dec_many(x0, st, reps: int):
        def one(c, i):
            # carry-dependent input defeats loop-invariant hoisting; the
            # scan carry makes every repetition's dispatch real work
            x0k = jnp.where(c == jnp.int32(123456789), x0 ^ 1, x0)
            return c ^ fn(x0k, st)[0, 0], None
        c, _ = jax.lax.scan(one, jnp.int32(0), jnp.arange(reps))
        return c

    def run(reps):
        r = dec_many(x0, st, reps)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = dec_many(x0, st, reps)
        jax.block_until_ready(r)
        return time.perf_counter() - t0

    # wide rep counts: narrow slopes can read 2-3x high on the shared
    # tunnel (docs/DESIGN.md bench traps); best-of-5 like the reference's
    # harness (main.cpp:169)
    lo, hi = 4, 28
    run(lo), run(hi)
    a = min(run(lo) for _ in range(5))
    b = min(run(hi) for _ in range(5))
    return SYMS / ((b - a) / (hi - lo)) / 1e9, container_bytes


def _cpu_fallback(book1):
    """Bench the native host codec instead (still useful signal when no
    TPU is attached).  Never touches the JAX backend."""
    import numpy as np

    from ryg_rans_tpu import native
    from ryg_rans_tpu.config import RansConfig, Variant
    from ryg_rans_tpu.models import stats

    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=1024,
                     lanes_per_stream=128, block_symbols=1 << 20)
    freqs, cum = stats.build_model(book1, cfg.prob_bits)
    payload, words = native.encode(cfg, book1, freqs, cum)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        dec = native.decode(cfg, payload, words, book1.size, freqs, cum)
        best = min(best, time.perf_counter() - t0)
    assert np.array_equal(dec, book1)
    gbs = book1.size / best / 1e9
    print(json.dumps({"metric": "decode_throughput_native_cpu",
                      "value": round(gbs, 4), "unit": "GB/s",
                      "vs_baseline": round(gbs / 0.5508, 3)}))


def main():
    """Orchestrator: NEVER initializes the JAX backend in this process.

    The remote-TPU tunnel can refuse to initialize (UNAVAILABLE) or HANG
    in backend setup -- and it can also wedge mid-run.  So: probe the
    backend in 2 x 90s subprocesses (no sleeps -- total probe budget
    ~3 min, VERDICT r3 weak #1), then run the TPU bench itself in a
    watchdogged subprocess; on any probe failure, subprocess timeout, or
    unparseable output, emit the native-CPU fallback line.  The driver
    therefore always gets a JSON line within bounded time."""
    import subprocess

    import numpy as np

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)

    on_tpu = False
    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=90)
            if r.returncode == 0 and "cpu" not in r.stdout:
                on_tpu = True
                break
            msg = (r.stdout + r.stderr).strip().splitlines()
            print(f"backend probe {attempt + 1}: "
                  f"{msg[-1] if msg else 'no output'}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"backend probe {attempt + 1}: hang (90s)",
                  file=sys.stderr)

    if on_tpu:
        # Watchdog the real run: a tunnel wedge between the probe and (or
        # during) the bench must not leave the driver without a number.
        try:
            r = subprocess.run([sys.executable, __file__, "--tpu-run"],
                               capture_output=True, text=True, timeout=1500)
            sys.stderr.write(r.stderr)
            line = next((ln for ln in reversed(r.stdout.splitlines())
                         if ln.startswith("{")), None)
            if r.returncode == 0 and line is not None:
                json.loads(line)  # must parse
                print(line)
                return
            print("TPU run failed; falling back to native CPU",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print("TPU run hung (1500s); falling back to native CPU",
                  file=sys.stderr)
    _cpu_fallback(book1)


def tpu_run():
    import numpy as np

    book1 = np.frombuffer(open("/root/reference/book1", "rb").read(),
                          np.uint8)

    from ryg_rans_tpu.models import stats

    # R=128 (16384 lanes) measured fastest on v5e r2 (13.0 GB/s WORD vs 9.3
    # at R=64; benchmarks/tune_word_decode.py); R=256 fails to compile.
    # BS=2^23 amortizes the 64 KiB/block flushed-state head to 0.8% while
    # holding full speed (benchmarks/tune_blocksize.py, r3):
    # 2^19 -> 5.28 bits/byte, 2^23 -> 4.58 at the same ~12.8 GB/s.
    R, NB, BS = 128, 4, 1 << 23
    SYMS = NB * BS
    data = np.tile(book1, (SYMS // book1.size) + 1)[:SYMS]
    models = {pb: stats.build_model(data, pb) for pb in (11, 16)}

    # Candidates within the <=2%-of-reference ratio budget, fastest wins:
    # ALIAS pb16 with the 6-gather-row tables measured 14.5-14.9 GB/s at
    # the BEST ratio (4.582 b/B); WORD pb11 (4 cum2sym rows) 13.6-13.9 at
    # 4.590 (r3, docs/DESIGN.md).
    results = {}
    for name, pb in (("ALIAS", 16), ("WORD", 11)):
        key = f"{name}_pb{pb}"
        try:
            results[key] = _bench_variant(name, pb, data, models, R, NB, BS)
        except Exception as e:  # pragma: no cover - variant-level guard
            print(f"ERROR: {key}: {type(e).__name__}: {e}", file=sys.stderr)
            results[key] = (0.0, 0)
        print(f"# {key}: {results[key][0]:.3f} GB/s, "
              f"{8 * results[key][1] / SYMS:.4f} bits/byte",
              file=sys.stderr)

    best = max(results, key=lambda k: results[k][0])
    gbs, nbytes = results[best]
    bpb = 8.0 * nbytes / SYMS
    # reference 2-way interleaved rans_byte: 435,117 B on 768,771-byte book1
    ref_bpb = 8.0 * 435117 / 768771
    print(json.dumps({"metric": "decode_throughput_tpu_per_chip",
                      "value": round(gbs, 4), "unit": "GB/s",
                      "vs_baseline": round(gbs / 0.5508, 3),
                      "variant": best,
                      "container_bytes": nbytes,
                      "bits_per_byte": round(bpb, 4),
                      "ratio_vs_reference": round(bpb / ref_bpb, 4)}))
    if gbs == 0.0:
        sys.exit(1)


if __name__ == "__main__":
    if "--tpu-run" in sys.argv:
        tpu_run()  # child process; parent watchdogs + falls back on failure
    else:
        try:
            main()
        except Exception as e:  # keep the driver's record parseable
            print(json.dumps({"metric": "decode_throughput_tpu_per_chip",
                              "value": 0.0, "unit": "GB/s",
                              "vs_baseline": 0.0}))
            print(f"ERROR: {type(e).__name__}: {e}", file=sys.stderr)
            sys.exit(1)
