"""Example: compressed data feeding an on-device consumer.

The serving pattern the framework is built for: blocks of a corpus are
stored compressed (TRNS container); a consumer jit-computes directly on the
decompressed device array -- decompression happens on the TPU with one host
transfer of the (much smaller) compressed payload, not the raw data.

Run: `python examples/device_pipeline.py [path]` (defaults to book1).
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

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/book1"
    raw = open(path, "rb").read()

    # lane-count tradeoff: more lanes = faster decode, but each lane's
    # flushed state costs 4 bytes per block; 2048 lanes suits MB-scale
    # files, 8192 suits bulk data (see docs/FORMAT.md)
    cfg = RansConfig(variant=Variant.ALIAS, prob_bits=16, n_lanes=2048,
                     lanes_per_stream=2048, block_symbols=1 << 19)
    blob = api.compress(raw, cfg)
    print(f"stored: {len(raw)} -> {len(blob)} bytes "
          f"({8 * len(blob) / len(raw):.2f} bits/byte)")

    # the consumer: any jitted computation over the decompressed bytes
    @jax.jit
    def consume(u8):
        x = u8.astype(jnp.float32)
        return x.mean(), x.std(), jnp.bincount(u8.astype(jnp.int32),
                                               length=256).argmax()

    t0 = time.perf_counter()
    device_bytes = api.decompress_to_device(blob)   # fused jit, stays on TPU
    mean, std, mode = consume(device_bytes)
    jax.block_until_ready(mean)
    dt = time.perf_counter() - t0

    assert np.asarray(device_bytes).tobytes() == raw
    print(f"decompressed on {device_bytes.device} and consumed in "
          f"{dt * 1e3:.1f} ms (cold): mean={float(mean):.2f} "
          f"std={float(std):.2f} mode=byte {int(mode)}")

    # random access: pull one block without decoding the rest
    b1 = api.decompress_block(blob, 1)
    assert b1 == raw[cfg.block_symbols:2 * cfg.block_symbols]
    print(f"random-access block 1: {len(b1)} bytes ok")

    # the reverse direction: data born on device gets compressed on-chip;
    # only the (smaller) payload crosses to the host
    cfg2 = RansConfig(variant=Variant.ALIAS, prob_bits=16, n_lanes=2048,
                      lanes_per_stream=2048, block_symbols=1 << 19,
                      checksum=False)
    blob2 = api.compress_from_device(device_bytes, cfg2)
    assert api.decompress(blob2) == raw
    print(f"device-side compress: {len(raw)} -> {len(blob2)} bytes, "
          "round-trip ok")


if __name__ == "__main__":
    main()
