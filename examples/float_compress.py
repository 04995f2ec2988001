"""Example: compressing device-resident float tensors (byte-plane split).

Raw float bits are near-incompressible as a byte stream (mantissa bytes
are ~uniform), but the bytes at each position within an element are NOT:
exponent/sign bytes of trained-weight-like distributions carry only a few
bits of entropy.  Splitting an array into per-position byte planes and
entropy-coding each plane separately -- the standard trick in production
float compressors -- makes rANS effective on checkpoint-shaped data, and
the whole pipeline (bitcast, plane split, histogram, encode) runs on the
TPU via compress_from_device; only coded payloads reach the host.

Run: `python examples/float_compress.py` (uses the current jax backend;
interpret-mode on CPU).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ryg_rans_tpu import api
    from ryg_rans_tpu.config import RansConfig, Variant

    # weight-shaped data: layer-scaled normals, like a trained checkpoint
    rng = np.random.default_rng(7)
    parts = [rng.normal(0, s, 1 << 20).astype(np.float32)
             for s in (0.02, 0.08, 0.5)]
    w32 = jnp.asarray(np.concatenate(parts))
    w16 = w32.astype(jnp.bfloat16)

    cfg = RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=1024,
                     block_symbols=1 << 19, checksum=False)

    def plane_compress(arr, width):
        """bitcast to bytes on device, split into per-position planes,
        compress each plane on-chip; returns (blobs, total_bytes)."""
        u8 = jax.lax.bitcast_convert_type(arr, jnp.uint8)  # (..., width)
        planes = [u8[..., i].reshape(-1) for i in range(width)]
        blobs = [api.compress_from_device(p, cfg) for p in planes]
        return blobs, sum(len(b) for b in blobs)

    def plane_decompress(blobs, width, dtype):
        planes = [api.decompress_to_device(b) for b in blobs]
        u8 = jnp.stack(planes, axis=-1)
        return jax.lax.bitcast_convert_type(u8, dtype)

    for name, arr, width, dtype in (("float32", w32, 4, jnp.float32),
                                    ("bfloat16", w16, 2, jnp.bfloat16)):
        nbytes = arr.size * width
        t0 = time.perf_counter()
        blobs, out = plane_compress(arr, width)
        dt = time.perf_counter() - t0
        back = plane_decompress(blobs, width, dtype)
        assert jnp.array_equal(
            jax.lax.bitcast_convert_type(back, jnp.uint8),
            jax.lax.bitcast_convert_type(arr, jnp.uint8)), "round-trip!"
        # whole-stream baseline: same codec, no plane split
        whole = api.compress_from_device(
            jax.lax.bitcast_convert_type(arr, jnp.uint8).reshape(-1), cfg)
        print(f"{name}: {nbytes} B -> planes {out} B "
              f"({8 * out / nbytes:.3f} bits/byte, "
              f"{nbytes / out:.2f}x) vs whole-stream {len(whole)} B "
              f"({nbytes / len(whole):.2f}x); lossless, "
              f"{dt * 1e3:.0f} ms cold")


if __name__ == "__main__":
    main()
