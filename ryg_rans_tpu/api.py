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

import dataclasses

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


#: max prob_bits per variant on the TPU kernel path -- the reference's own
#: maxima (rans_byte.h:176 allows 16; rans64.h:169 allows 31; WORD's
#: stream words are 16-bit so freq <= 2^15 keeps slot math exact)
_TPU_MAX_PB = {Variant.WORD: 15, Variant.BYTE: 16, Variant.ALIAS: 16,
               Variant.RANS64: 31}


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


def _tpu_supported(cfg: RansConfig, n_symbols: int | None = None) -> bool:
    """True when the Pallas kernel path handles ``cfg`` (for ``n_symbols``
    of input, when known).

    Kernel constraints, verified compiled on v5e:
      * one substream per block (the kernels' stream layout);
      * 9 <= prob_bits <= the per-variant kernel maximum;
      * n_lanes a multiple of 128 (vreg rows) and >= 256 (Mosaic rejects
        single-sublane lane-gathers when compiled);
      * block_symbols a multiple of 4*n_lanes (symbols travel 4-packed);
      * multi-block grids slice (R,128)-row blocks and Mosaic requires
        sliced sublane extents divisible by 8, so n_lanes % 1024 == 0 --
        UNLESS the whole (padded) input is a single block, where the block
        shape equals the full array and any R >= 2 compiles.
    """
    if not (9 <= cfg.prob_bits <= _TPU_MAX_PB[cfg.variant]
            and cfg.n_lanes >= 256 and cfg.n_lanes % 128 == 0
            and cfg.lanes_per_stream == cfg.n_lanes
            and cfg.block_symbols % (4 * cfg.n_lanes) == 0):
        return False
    if cfg.n_lanes % 1024 == 0:
        return True
    if n_symbols is None:
        return False
    step = 4 * cfg.n_lanes
    padded = -(-max(n_symbols, 1) // step) * step
    return padded <= cfg.block_symbols


def _pick_backend(cfg: RansConfig, backend: str,
                  n_symbols: int | None = None) -> str:
    from .utils.log import backend_choice

    if backend != "auto":
        chosen = backend
    elif _tpu_supported(cfg, n_symbols) and _tpu_live():
        chosen = "tpu"
    elif native.available():
        chosen = "native"
    else:
        chosen = "numpy"
    backend_choice(cfg, backend, chosen)
    return chosen


def _host_pool_map(fn, items):
    """Order-preserving map over independent blocks, threaded when both the
    host has multiple cores and there is more than one item (the native
    core releases the GIL for the duration of each C call).  Sequential
    fallback keeps single-core machines and single-block inputs free of
    thread overhead."""
    import os
    workers = min(len(items), os.cpu_count() or 1)
    if workers <= 1:
        return [fn(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(fn, items))


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


def _encode_payloads(cfg: RansConfig, be: str, padded: np.ndarray,
                     freqs, cum) -> list[list[np.ndarray]]:
    """Encode a padded symbol array (multiple of 4*n_lanes) into
    per-block, per-substream word arrays on the given backend.

    The native backend codes blocks in parallel across host threads
    (blocks are independent; the ctypes call releases the GIL), scaling
    the host fallback with core count.  Outputs are collected in block
    order, so the container stays byte-identical at any worker count."""
    if be == "tpu":
        blocks, _ = _tpu_mod(cfg).encode(cfg, padded, freqs, cum,
                                         interpret=not _tpu_live())
        return [[b] for b in blocks]

    def enc_native(chunk):
        payload, words = native.encode(cfg, chunk, freqs, cum)
        splits = np.cumsum(
            words * np.dtype(cont.word_dtype(cfg.variant)).itemsize)
        wdt = cont.word_dtype(cfg.variant)
        return [payload[(splits[i - 1] if i else 0):splits[i]].view(wdt)
                for i in range(len(words))]

    chunks = [padded[off:off + size]
              for off, size in _block_slices(cfg, padded.size)]
    if be == "native":
        return list(_host_pool_map(enc_native, chunks))
    if be == "numpy":
        return [oracle.encode(cfg, chunk, freqs, cum) for chunk in chunks]
    raise ValueError(f"unknown backend {be!r}")


def _decode_payloads(cfg: RansConfig, be: str, payloads, sizes, freqs,
                     cum, raw=None) -> list[np.ndarray]:
    """Decode per-block payloads (padded sizes in ``sizes``, the usual
    [B, ..., B, tail] pattern) into per-block symbol arrays.

    ``raw`` marks blocks stored verbatim (container FLAG_RAW): those skip
    the codec entirely and are zero-padded to their padded size (the pad is
    sliced off by the caller via orig_len).  Only the last block can be
    shorter than block_symbols, so the coded subset still follows the
    [B, ..., B, tail] pattern the backends expect."""
    if raw is not None and np.any(raw):
        out: list = [None] * len(payloads)
        coded = [i for i in range(len(payloads)) if not raw[i]]
        if coded:
            dec = _decode_payloads(cfg, be, [payloads[i] for i in coded],
                                   [sizes[i] for i in coded], freqs, cum)
            for i, arr in zip(coded, dec):
                out[i] = arr
        for i in range(len(payloads)):
            if raw[i]:
                b = np.asarray(payloads[i][0], np.uint8)
                arr = np.zeros(sizes[i], np.uint8)
                arr[:b.size] = b
                out[i] = arr
        return out
    if be == "tpu":
        blocks = [blk[0] for blk in payloads]
        out = _tpu_mod(cfg).decode(cfg, blocks, int(sum(sizes)), freqs, cum,
                                   interpret=not _tpu_live())
        bounds = np.cumsum(sizes)[:-1]
        return np.split(out, bounds)
    if be == "native":
        def dec_native(args):
            blk, size = args
            payload = np.concatenate(
                [s.view(np.uint8) for s in blk]) if blk else np.zeros(
                    0, np.uint8)
            words = np.array([s.size for s in blk], np.int64)
            return native.decode(cfg, payload, words, size, freqs, cum)
        return list(_host_pool_map(dec_native, list(zip(payloads, sizes))))
    if be == "numpy":
        return [oracle.decode(cfg, blk, size, freqs, cum)
                for blk, size in zip(payloads, sizes)]
    raise ValueError(f"unknown backend {be!r}")


def compress(data, cfg: RansConfig | None = None,
             backend: str = "auto") -> bytes:
    """Compress bytes/uint8 array -> TRNS container bytes.

    With no explicit ``cfg`` the shape adapts to the input size
    (RansConfig.auto): small inputs stay ratio-optimal, large inputs use
    the benchmarked Pareto shape (16384 lanes, 2^23-symbol blocks)."""
    data = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.asarray(data, np.uint8)
    cfg = cfg or RansConfig.auto(data.size)
    if data.size == 0:
        return cont.pack(cfg, 0, np.zeros(256, np.uint32), [], None)

    be = _pick_backend(cfg, backend, data.size)
    if be == "tpu" and data.size >= (1 << 22) and _tpu_live():
        # Device-side model + pad (r5): ONE h2d transfer feeds histogram
        # AND encode; the 256-count fetch replaces the host bincount and
        # the host pad copy (the reference's count_freqs walks the input
        # once too, main.cpp:59-66 -- here that walk rides the transfer
        # the encode needs anyway).  Counts are exact integers, so the
        # container stays byte-identical to the host paths.
        import jax.numpy as jnp
        dev = jnp.asarray(data)
        counts = np.asarray(jnp.bincount(dev, length=256))
        freqs, cum = stats.build_model_from_counts(
            counts.astype(np.int64), cfg.prob_bits)
        step = 4 * cfg.n_lanes
        S_pad = -(-max(data.size, 1) // step) * step
        padded = dev if S_pad == data.size else jnp.concatenate(
            [dev, jnp.full(S_pad - data.size, int(np.argmax(freqs)),
                           jnp.uint8)])
    else:
        freqs, cum = stats.build_model(data, cfg.prob_bits)
        padded = _pad(data, cfg, freqs)

    crcs = [] if cfg.checksum else None
    payloads = _encode_payloads(cfg, be, padded, freqs, cum)

    # raw-block fallback (reference stream twist #3, rans_byte.h:28-35):
    # store a block verbatim when coding would not shrink it, so
    # incompressible data costs at most the container overhead.  The
    # decision depends only on payload sizes, which are byte-identical
    # across backends, so containers stay backend-independent.
    wsize = np.dtype(cont.word_dtype(cfg.variant)).itemsize
    raw = np.zeros(len(payloads), bool)
    for b, (off, size) in enumerate(_block_slices(cfg, padded.size)):
        end = min(off + size, data.size)
        if sum(s.size for s in payloads[b]) * wsize >= end - off:
            raw[b] = True
            payloads[b] = [data[off:end].copy()]

    if cfg.checksum:
        for off, size in _block_slices(cfg, padded.size):
            end = min(off + size, data.size)
            crcs.append(cont.crc32(data[off:end]) if off < data.size else 0)
        crcs = np.array(crcs, np.uint32)

    blob = cont.pack(cfg, data.size, freqs, payloads, crcs,
                     raw if raw.any() else None)
    from .utils.log import container_summary
    container_summary(data.size, len(blob), len(payloads))
    return blob


def decompress(blob, backend: str = "auto") -> bytes:
    """Decompress a TRNS container -> original bytes."""
    c = cont.unpack(blob)
    cfg = c.cfg
    if c.orig_len == 0:
        return b""
    freqs = c.freqs
    cum = stats.calc_cum_freqs(freqs)
    be = _pick_backend(cfg, backend, c.orig_len)

    sizes = c.block_sizes()
    out = np.concatenate(
        _decode_payloads(cfg, be, c.payloads, sizes, freqs, cum, c.raw))

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


def decompress_to_device(blob):
    """Decode a TRNS container directly into a device-resident uint8 array.

    For pipelines that consume decompressed data on-chip (e.g. datasets,
    checkpointed activations): container parsing happens on host, then ONE
    device transfer of the packed streams and ONE fused jit (prep -> Pallas
    kernel -> unpack) produce the symbols on device -- no host round-trip
    for the data itself.  Requires a TPU-kernel-supported config; the
    padding tail beyond orig_len is sliced off on device.

    CRC contract: per-block CRCs (FLAG_CRC) cover the ORIGINAL bytes, which
    never visit the host here, so they are NOT validated -- by design, to
    keep the path transfer-free.  Callers that need integrity checking
    should use decompress() (validates CRCs host-side) or CRC the device
    array themselves after consuming it.
    """
    import jax
    import jax.numpy as jnp

    c = cont.unpack(blob)
    cfg = c.cfg
    if not _tpu_supported(cfg, c.orig_len):
        raise ValueError("config not supported by the TPU kernel path; "
                         "use decompress() instead")
    freqs = c.freqs
    cum = stats.calc_cum_freqs(freqs)
    interpret = not _tpu_live()
    mod = _tpu_mod(cfg)
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    sizes = c.block_sizes()
    raw = c.raw if c.raw is not None else np.zeros(len(sizes), bool)
    blocks = [blk[0] for blk in c.payloads]

    if cfg.variant == Variant.WORD:
        s4, fc = mod.pack_dec_rows2(freqs, cum, cfg.prob_bits)
        tables = (jnp.asarray(s4), jnp.asarray(fc))
    elif cfg.variant == Variant.RANS64:
        s4, fc = mod.pack_dec_tables(freqs, cum, cfg.prob_bits)
        tables = (jnp.asarray(s4) if s4 is not None else None,
                  jnp.asarray(fc))
    else:
        tables = mod.dec_tables(cfg, freqs, cum)

    results: list = [None] * len(sizes)
    for i in range(len(sizes)):
        if raw[i]:
            # raw block: bytes go to the device verbatim, zero-padded to
            # the padded block size (the pad falls past orig_len only for
            # the last block; raw middle blocks are always exactly full)
            b = jnp.asarray(np.asarray(blocks[i], np.uint8))
            pad = sizes[i] - blocks[i].size
            results[i] = jnp.pad(b, (0, pad)) if pad else b

    B = cfg.block_symbols
    coded = [i for i in range(len(sizes)) if not raw[i]]
    groups = []
    full_idx = [i for i in coded if sizes[i] == B]
    tail_idx = [i for i in coded if sizes[i] != B]
    if full_idx:
        groups.append((full_idx, B))
    if tail_idx:
        groups.append((tail_idx, sizes[tail_idx[0]]))
    for idxs, block_syms in groups:
        nb = len(idxs)
        T4 = block_syms // N // 4
        max_units = max(blocks[i].size for i in idxs)
        cap_rows = mod.decode_cap_rows(max_units, R)
        buf = np.zeros((nb, max_units), np.int32)
        for j, i in enumerate(idxs):
            b = blocks[i]
            buf[j, :b.size] = b.astype(np.int64).astype(np.int32) \
                if b.dtype != np.uint32 else b.view(np.int32)
        ilp = 2 if nb % 2 == 0 else 1
        if cfg.variant == Variant.WORD or cfg.variant == Variant.RANS64:
            out = mod.decode_fused(*tables, jnp.asarray(buf), T4=T4, R=R,
                                   sb=cfg.prob_bits, cap_rows=cap_rows,
                                   n_blocks=nb, interpret=interpret, ilp=ilp)
        else:
            out = mod.decode_fused(tables, jnp.asarray(buf), T4=T4, R=R,
                                   sb=cfg.prob_bits, cap_rows=cap_rows,
                                   n_blocks=nb,
                                   alias=cfg.variant == Variant.ALIAS,
                                   interpret=interpret, ilp=ilp)
        out = out.reshape(nb, block_syms)
        for j, i in enumerate(idxs):
            results[i] = out[j]
    full = results[0] if len(results) == 1 else jnp.concatenate(results)
    return full[:c.orig_len]


def decompress_block(blob, block: int, backend: str = "auto") -> bytes:
    """Random-access decode of ONE block from a TRNS container.

    Blocks are independent (no shared coder state, SURVEY.md §2.8:
    chip/host parallelism is pure data-parallelism over blocks), so any
    block decodes without touching the others' payload -- the capability
    the reference's single self-contained stream cannot offer.  Returns
    that block's original bytes (the last block may be short).
    """
    c = cont.unpack(blob)
    cfg = c.cfg
    sizes = c.block_sizes()
    if not 0 <= block < len(sizes):
        raise IndexError(f"block {block} out of range [0, {len(sizes)})")
    off = block * cfg.block_symbols
    if off >= c.orig_len:
        return b""
    freqs = c.freqs
    cum = stats.calc_cum_freqs(freqs)
    size = sizes[block]
    be = _pick_backend(cfg, backend, size)
    blk = c.payloads[block]
    if c.raw is not None and c.raw[block]:
        out = np.asarray(blk[0], np.uint8)  # stored verbatim, unpadded
        if c.crcs is not None and cont.crc32(out) != int(c.crcs[block]):
            raise ValueError(f"crc mismatch in block {block}")
        return out.tobytes()
    if be == "tpu":
        out = _tpu_mod(cfg).decode(cfg, [blk[0]], size, freqs, cum,
                                   interpret=not _tpu_live())
    elif be == "native":
        payload = np.concatenate(
            [s.view(np.uint8) for s in blk]) if blk else np.zeros(0, np.uint8)
        words = np.array([s.size for s in blk], np.int64)
        out = native.decode(cfg, payload, words, size, freqs, cum)
    elif be == "numpy":
        out = oracle.decode(cfg, blk, size, freqs, cum)
    else:
        raise ValueError(f"unknown backend {be!r}")
    end = min(off + size, c.orig_len)
    out = out[:end - off]
    if c.crcs is not None and cont.crc32(out) != int(c.crcs[block]):
        raise ValueError(f"crc mismatch in block {block}")
    return out.tobytes()


def compress_from_device(arr, cfg: RansConfig | None = None) -> bytes:
    """Compress a device-resident uint8 array into TRNS container bytes.

    The symmetric counterpart of decompress_to_device, for pipelines whose
    data already lives on-chip (activations, datasets): the histogram,
    symbol packing, dense encode and stream compaction all run on device;
    the host receives the 256-bin histogram (the exact integer
    normalization, main.cpp:75-129, is sequential scalar logic) and ONE
    compacted buffer per block group, then assembles the container.  The
    result is byte-identical to ``compress(np.asarray(arr), cfg)`` with
    the same config.

    Requires a TPU-kernel-supported config with ``checksum=False`` (CRCs
    cover the original bytes, which never visit the host here).  Blocks
    that fail to shrink still fall back to raw storage -- only those
    blocks' bytes are fetched from the device.
    """
    import jax.numpy as jnp

    if cfg is None:
        cfg = dataclasses.replace(
            RansConfig.auto(int(np.prod(np.shape(arr)))), checksum=False)
    if cfg.checksum:
        raise ValueError("compress_from_device requires checksum=False "
                         "(CRCs cover host-side original bytes)")
    arr = jnp.asarray(arr, jnp.uint8).reshape(-1)
    S = int(arr.size)
    if S == 0:
        return cont.pack(cfg, 0, np.zeros(256, np.uint32), [], None)
    if not _tpu_supported(cfg, S):
        raise ValueError("config not supported by the TPU kernel path; "
                         "use compress() instead")

    counts = np.asarray(jnp.bincount(arr, length=256))
    freqs, cum = stats.build_model_from_counts(counts.astype(np.int64),
                                               cfg.prob_bits)

    interpret = not _tpu_live()
    mod = _tpu_mod(cfg)
    from .ops import word_tpu
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    step = 4 * N
    S_pad = -(-S // step) * step
    if S_pad != S:
        arr = jnp.pad(arr, (0, S_pad - S),
                      constant_values=int(np.argmax(freqs)))
    B = cfg.block_symbols
    n_full, tail = divmod(S_pad, B)
    sb = cfg.prob_bits
    alias = cfg.variant == Variant.ALIAS
    wdt = cont.word_dtype(cfg.variant)
    wsize = np.dtype(wdt).itemsize

    if cfg.variant in (Variant.BYTE, Variant.ALIAS):
        from .ops import byte_tpu
        tables = byte_tpu.enc_tables(cfg, freqs, cum)
    elif cfg.variant == Variant.RANS64:
        from .ops import rans64_tpu
        recip = sb > 16
        tables = jnp.asarray(
            rans64_tpu.pack_enc_tables_recip(freqs, cum, sb) if recip
            else rans64_tpu.pack_enc_tables(freqs, cum))
    else:
        tables = jnp.asarray(word_tpu.pack_enc_rows(freqs, cum, sb))

    out_blocks: list[np.ndarray] = []

    def run(chunk, n_blocks: int):
        T = chunk.size // n_blocks // N
        T4 = T // 4
        ilp = 2 if n_blocks % 2 == 0 else 1
        spk = word_tpu.pack_symbols(chunk, T4, R, n_blocks)
        if cfg.variant == Variant.WORD:
            emit, xf = word_tpu.encode_blocks(
                tables, spk, T4=T4, R=R, sb=sb, n_blocks=n_blocks,
                interpret=interpret, ilp=ilp)
            buf, n_units = word_tpu.compact_emissions(emit, xf, T * N,
                                                      n_blocks)
        elif cfg.variant in (Variant.BYTE, Variant.ALIAS):
            from .ops import byte_tpu
            emit, xf = byte_tpu.encode_blocks(
                tables, spk, T4=T4, R=R, sb=sb, n_blocks=n_blocks,
                alias=alias, interpret=interpret, ilp=ilp)
            buf, n_units = byte_tpu.compact_emissions(emit, xf, 2 * T * N,
                                                      n_blocks)
        else:
            from .ops import rans64_tpu
            ew, ev, xlo, xhi = rans64_tpu.encode_blocks(
                tables, spk, T4=T4, R=R, sb=sb, n_blocks=n_blocks,
                interpret=interpret, ilp=ilp, recip=sb > 16)
            buf, n_units = rans64_tpu.compact_emissions(ew, ev, xlo, xhi,
                                                        T * N, n_blocks)
        buf_np = np.asarray(buf)  # ONE host transfer per group
        n_np = np.asarray(n_units)
        for b in range(n_blocks):
            n = int(n_np[b])
            if cfg.variant == Variant.RANS64:
                out_blocks.append(buf_np[b, :n].copy().view(np.uint32))
            else:
                out_blocks.append(buf_np[b, :n].astype(wdt))

    if n_full:
        run(arr[:n_full * B], n_full)
    if tail:
        run(arr[n_full * B:], 1)

    payloads = [[blk] for blk in out_blocks]
    raw = np.zeros(len(payloads), bool)
    for b in range(len(payloads)):
        off = b * B
        end = min(off + B, S)
        if out_blocks[b].size * wsize >= end - off:
            raw[b] = True  # fetch only this block's original bytes
            payloads[b] = [np.asarray(arr[off:end], np.uint8)]
    blob = cont.pack(cfg, S, freqs, payloads, None,
                     raw if raw.any() else None)
    from .utils.log import container_summary
    container_summary(S, len(blob), len(payloads))
    return blob
