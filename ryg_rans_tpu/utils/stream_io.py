"""Bounded-memory file compression: stream blocks through the codec.

compress()/decompress() hold the whole input and container in memory; these
file variants process a group of blocks at a time, so memory use is
O(group) regardless of file size.  Model building still needs one pass over
the input (the reference's order-0 model is global, main.cpp:140), so
compression reads the file twice; block payloads are spooled to a temp file
during the second pass and concatenated after the counts table -- the
container format (docs/FORMAT.md) is unchanged and fully interoperable
with the in-memory API.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..config import RansConfig
from ..models import stats
from . import container as cont


def _hist_file(path: str, chunk: int = 1 << 24) -> tuple[np.ndarray, int]:
    counts = np.zeros(256, np.int64)
    total = 0
    with open(path, "rb") as f:
        while True:
            buf = f.read(chunk)
            if not buf:
                break
            arr = np.frombuffer(buf, np.uint8)
            counts += np.bincount(arr, minlength=256)
            total += arr.size
    return counts, total


def compress_file(src: str, dst: str, cfg: RansConfig | None = None,
                  backend: str = "auto", blocks_per_batch: int = 16) -> int:
    """Compress ``src`` into a TRNS container at ``dst`` with O(batch)
    memory.  Returns the container size in bytes."""
    from .. import api

    counts, orig_len = _hist_file(src)
    # size-adaptive default, like api.compress (RansConfig.auto)
    cfg = cfg or RansConfig.auto(orig_len)
    if orig_len == 0:
        blob = cont.pack(cfg, 0, np.zeros(256, np.uint32), [], None)
        with open(dst, "wb") as f:
            f.write(blob)
        return len(blob)
    freqs, cum = stats.build_model_from_counts(counts, cfg.prob_bits)

    B = cfg.block_symbols
    step = 4 * cfg.n_lanes
    padded_len = -(-orig_len // step) * step
    fill = int(np.argmax(freqs))

    be = api._pick_backend(cfg, backend, orig_len)
    word_counts: list[list[int]] = []
    crcs: list[int] = [] if cfg.checksum else None
    raw_flags: list[bool] = []
    wsize = np.dtype(cont.word_dtype(cfg.variant)).itemsize

    tmp_fd, tmp_path = tempfile.mkstemp(dir=os.path.dirname(
        os.path.abspath(dst)) or ".")
    try:
        with open(src, "rb") as fin, os.fdopen(tmp_fd, "wb") as ftmp:
            read = 0
            while read < padded_len:
                want = min(blocks_per_batch * B, padded_len - read)
                raw = fin.read(min(want, max(orig_len - read, 0)))
                arr = np.full(want, fill, np.uint8)
                if raw:
                    arr[:len(raw)] = np.frombuffer(raw, np.uint8)
                payloads = api._encode_payloads(cfg, be, arr, freqs, cum)
                for i, blk in enumerate(payloads):
                    off = read + i * B
                    end = min(off + B, orig_len)
                    n_orig = end - off
                    if sum(s.size for s in blk) * wsize >= n_orig:
                        # raw-block fallback (see api.compress)
                        raw_flags.append(True)
                        word_counts.append(
                            [n_orig] + [0] * (cfg.n_streams - 1))
                        ftmp.write(arr[i * B:i * B + n_orig].tobytes())
                    else:
                        raw_flags.append(False)
                        word_counts.append([s.size for s in blk])
                        for s in blk:
                            ftmp.write(np.ascontiguousarray(
                                s, cont.word_dtype(cfg.variant)).tobytes())
                    if cfg.checksum:
                        crcs.append(cont.crc32(arr[i * B:i * B + n_orig])
                                    if off < orig_len else 0)
                read += want

        with open(dst, "wb") as fout:
            head = cont.pack_header(cfg, orig_len, freqs,
                                    np.asarray(word_counts, np.uint32),
                                    np.asarray(crcs, np.uint32)
                                    if crcs is not None else None,
                                    np.asarray(raw_flags, bool))
            fout.write(head)
            with open(tmp_path, "rb") as ftmp:
                while True:
                    buf = ftmp.read(1 << 24)
                    if not buf:
                        break
                    fout.write(buf)
        return os.path.getsize(dst)
    finally:
        os.unlink(tmp_path)


def decompress_file(src: str, dst: str, backend: str = "auto",
                    blocks_per_batch: int = 16) -> int:
    """Decompress a TRNS container file block-batch-wise into ``dst``.
    Returns the number of bytes written."""
    from .. import api

    with open(src, "rb") as f:
        meta, payload_off = cont.read_header(f)
        cfg = meta.cfg
        if meta.orig_len == 0:
            open(dst, "wb").close()
            return 0
        freqs = meta.freqs
        cum = stats.calc_cum_freqs(freqs)
        be = api._pick_backend(cfg, backend, meta.orig_len)
        B = cfg.block_symbols
        sizes = meta.block_sizes()

        f.seek(payload_off)
        written = 0
        with open(dst, "wb") as fout:
            b = 0
            while b < len(sizes):
                batch = list(range(b, min(b + blocks_per_batch, len(sizes))))
                payloads = []
                for bi in batch:
                    is_raw = meta.raw is not None and meta.raw[bi]
                    dt = np.uint8 if is_raw else cont.word_dtype(cfg.variant)
                    ws = np.dtype(dt).itemsize
                    blk = []
                    for s in range(cfg.n_streams):
                        n = int(meta.stream_words[bi, s])
                        blk.append(np.frombuffer(f.read(n * ws), dt))
                    payloads.append(blk)
                out = api._decode_payloads(
                    cfg, be, payloads, [sizes[bi] for bi in batch],
                    freqs, cum,
                    meta.raw[batch] if meta.raw is not None else None)
                for bi, arr in zip(batch, out):
                    off = bi * B
                    end = min(off + sizes[bi], meta.orig_len)
                    if off >= meta.orig_len:
                        break
                    arr = arr[:end - off]
                    if meta.crcs is not None and \
                            cont.crc32(arr) != int(meta.crcs[bi]):
                        raise ValueError(f"crc mismatch in block {bi}")
                    fout.write(arr.tobytes())
                    written += end - off
                b += blocks_per_batch
        return written
