"""Public one-call API: compress / decompress with backend routing.

Backends:
  * "tpu"    -- Pallas lane-parallel kernels (WORD variant; flagship path)
  * "native" -- C++ host core (all variants; reference-class scalar speed)
  * "numpy"  -- pure NumPy oracle (all variants; slow, always available)
  * "auto"   -- tpu when a TPU backend is live and the config fits it,
                else native, else numpy.

All backends produce byte-identical containers for the same config: the
format pads each block to a multiple of 4*n_lanes (docs/FORMAT.md), so the
TPU path's mask-free kernels and the host paths agree exactly.
"""

from __future__ import annotations

import numpy as np

from . import native
from .config import RansConfig, Variant
from .models import stats
from .ops import reference_numpy as oracle
from .utils import container as cont


def _tpu_live() -> bool:
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


#: max prob_bits per variant on the TPU kernel path
_TPU_MAX_PB = {Variant.WORD: 12, Variant.BYTE: 14, Variant.ALIAS: 16,
               Variant.RANS64: 15}


def _tpu_mod(cfg: RansConfig):
    """The kernel module handling ``cfg.variant`` (word_tpu / byte_tpu /
    rans64_tpu); all expose the same encode/decode orchestration API."""
    if cfg.variant == Variant.WORD:
        from .ops import word_tpu
        return word_tpu
    if cfg.variant in (Variant.BYTE, Variant.ALIAS):
        from .ops import byte_tpu
        return byte_tpu
    from .ops import rans64_tpu
    return rans64_tpu


def _tpu_supported(cfg: RansConfig) -> bool:
    return (9 <= cfg.prob_bits <= _TPU_MAX_PB[cfg.variant]
            and cfg.n_lanes >= 1024 and cfg.n_lanes % 1024 == 0
            and cfg.lanes_per_stream == cfg.n_lanes)


def _pick_backend(cfg: RansConfig, backend: str) -> str:
    if backend != "auto":
        return backend
    if _tpu_supported(cfg) and _tpu_live():
        return "tpu"
    if native.available():
        return "native"
    return "numpy"


def _pad(data: np.ndarray, cfg: RansConfig, freqs) -> np.ndarray:
    step = 4 * cfg.n_lanes
    S_pad = -(-max(data.size, 1) // step) * step
    if S_pad == data.size:
        return data
    out = np.full(S_pad, int(np.argmax(freqs)), np.uint8)
    out[:data.size] = data
    return out


def _block_slices(cfg: RansConfig, padded_len: int):
    B = cfg.block_symbols
    off = 0
    while off < padded_len:
        yield off, min(B, padded_len - off)
        off += min(B, padded_len - off)


def compress(data, cfg: RansConfig | None = None,
             backend: str = "auto") -> bytes:
    """Compress bytes/uint8 array -> TRNS container bytes."""
    data = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.asarray(data, np.uint8)
    cfg = cfg or RansConfig()
    if data.size == 0:
        return cont.pack(cfg, 0, np.zeros(256, np.uint32), [], None)

    freqs, cum = stats.build_model(data, cfg.prob_bits)
    be = _pick_backend(cfg, backend)
    padded = _pad(data, cfg, freqs)

    payloads: list[list[np.ndarray]] = []
    crcs = [] if cfg.checksum else None

    if be == "tpu":
        blocks, _ = _tpu_mod(cfg).encode(cfg, padded, freqs, cum,
                                         interpret=not _tpu_live())
        payloads = [[b] for b in blocks]
    else:
        for off, size in _block_slices(cfg, padded.size):
            chunk = padded[off:off + size]
            if be == "native":
                payload, words = native.encode(cfg, chunk, freqs, cum)
                splits = np.cumsum(
                    words * np.dtype(cont.word_dtype(cfg.variant)).itemsize)
                wdt = cont.word_dtype(cfg.variant)
                blk = [payload[(splits[i - 1] if i else 0):splits[i]].view(wdt)
                       for i in range(len(words))]
            elif be == "numpy":
                blk = oracle.encode(cfg, chunk, freqs, cum)
            else:
                raise ValueError(f"unknown backend {be!r}")
            payloads.append(blk)

    if cfg.checksum:
        for off, size in _block_slices(cfg, padded.size):
            end = min(off + size, data.size)
            crcs.append(cont.crc32(data[off:end]) if off < data.size else 0)
        crcs = np.array(crcs, np.uint32)

    return cont.pack(cfg, data.size, freqs, payloads, crcs)


def decompress(blob, backend: str = "auto") -> bytes:
    """Decompress a TRNS container -> original bytes."""
    c = cont.unpack(blob)
    cfg = c.cfg
    if c.orig_len == 0:
        return b""
    freqs = c.freqs
    cum = stats.calc_cum_freqs(freqs)
    be = _pick_backend(cfg, backend)

    sizes = c.block_sizes()
    if be == "tpu":
        blocks = [blk[0] for blk in c.payloads]
        out = _tpu_mod(cfg).decode(cfg, blocks, c.padded_len, freqs, cum,
                                   interpret=not _tpu_live())
    else:
        parts = []
        for b, size in enumerate(sizes):
            blk = c.payloads[b]
            if be == "native":
                payload = np.concatenate(
                    [s.view(np.uint8) for s in blk]) if blk else np.zeros(
                        0, np.uint8)
                words = np.array([s.size for s in blk], np.int64)
                parts.append(native.decode(cfg, payload, words, size, freqs,
                                           cum))
            elif be == "numpy":
                parts.append(oracle.decode(cfg, blk, size, freqs, cum))
            else:
                raise ValueError(f"unknown backend {be!r}")
        out = np.concatenate(parts)

    out = out[:c.orig_len]
    if c.crcs is not None:
        B = cfg.block_symbols
        for b, size in enumerate(sizes):
            off = b * B
            end = min(off + size, c.orig_len)
            if off >= c.orig_len:
                break
            if cont.crc32(out[off:end]) != int(c.crcs[b]):
                raise ValueError(f"crc mismatch in block {b}")
    return out.tobytes()
