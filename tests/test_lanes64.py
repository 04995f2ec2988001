"""Exactness tests for the 64-bit limb primitives in ops/lanes.py that the
RANS64 kernels build on (the VPU emulation of Rans64MulHi, rans64.h:31-51,
and friends).  Compared against arbitrary-precision Python ints over random
and adversarial operands."""

import numpy as np
import pytest

import jax.numpy as jnp

from ryg_rans_tpu.ops import lanes


def _pair(x):
    """uint64 array -> ((8,128) hi, lo) int32 lane pairs."""
    return (jnp.asarray((x >> np.uint64(32)).astype(np.uint32)
                        .view(np.int32).reshape(8, 128)),
            jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                        .view(np.int32).reshape(8, 128)))


def _unpair(hi, lo):
    h = np.asarray(hi).reshape(-1).astype(np.int64) & 0xFFFFFFFF
    l = np.asarray(lo).reshape(-1).astype(np.int64) & 0xFFFFFFFF
    return [(int(a) << 32) | int(b) for a, b in zip(h, l)]


@pytest.fixture()
def operands(rng):
    n = 8 * 128
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    a[:6] = [0, 1, (1 << 64) - 1, 1 << 63, (1 << 63) - 1, 0xFFFF0000FFFF0000]
    b[:6] = [(1 << 64) - 1, (1 << 64) - 1, (1 << 64) - 1, 1 << 63, 1, 3]
    return a, b


def test_mulhi64(operands):
    a, b = operands
    hh, hl = lanes.mulhi64(*_pair(a), *_pair(b))
    got = _unpair(hh, hl)
    assert all(g == (int(x) * int(y)) >> 64
               for g, x, y in zip(got, a, b))


def test_mul_u32_u64(rng, operands):
    a, b = operands
    c = rng.integers(0, 1 << 32, a.size, dtype=np.uint64).astype(np.uint32)
    c[:3] = [0, 1, 0xFFFFFFFF]
    ci = jnp.asarray(c.view(np.int32).reshape(8, 128))
    ph, plo = lanes.mul_u32_u64(ci, *_pair(b))
    got = _unpair(ph, plo)
    assert all(g == (int(x) * int(y)) % (1 << 64)
               for g, x, y in zip(got, c, b))


def test_add64(operands):
    a, b = operands
    sh, sl = lanes.add64(*_pair(a), *_pair(b))
    got = _unpair(sh, sl)
    assert all(g == (int(x) + int(y)) % (1 << 64)
               for g, x, y in zip(got, a, b))


def test_srl64(rng, operands):
    a, _ = operands
    ns = rng.integers(0, 31, a.size).astype(np.int32)
    ns[:2] = [0, 30]
    rh, rl = lanes.srl64(*_pair(a), jnp.asarray(ns.reshape(8, 128)))
    got = _unpair(rh, rl)
    assert all(g == int(x) >> int(s) for g, x, s in zip(got, a, ns))
