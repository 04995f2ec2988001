"""ctypes binding to the C++ native core (ryg_rans_tpu/csrc/rans_core.cpp).

The shared library is built on first use with g++ (cached next to the
source, keyed on a source hash).  Falls back gracefully: ``available()``
returns False when no compiler is present, and callers route to the NumPy
oracle instead.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import shutil
import subprocess
import threading

import numpy as np

from .config import RansConfig, Variant

_SRC = pathlib.Path(__file__).resolve().parent / "csrc" / "rans_core.cpp"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_U32P = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> ctypes.CDLL | None:
    if shutil.which("g++") is None or not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("RYG_RANS_TPU_CACHE",
                       pathlib.Path.home() / ".cache" / "ryg_rans_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"rans_core_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(str(so))

    lib.trans_encode.restype = ctypes.c_int64
    lib.trans_encode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _U8P, ctypes.c_int64, _U32P, _U32P, _U8P, ctypes.c_int64, _I64P,
    ]
    lib.trans_decode.restype = ctypes.c_int64
    lib.trans_decode.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _U8P, _I64P, ctypes.c_int64, _U32P, _U32P, _U8P,
    ]
    lib.trans_build_alias.restype = ctypes.c_int64
    lib.trans_build_alias.argtypes = [
        ctypes.c_int, _U32P, _U32P, _U32P, _U32P, _U32P, _U8P, _U32P,
    ]
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build()
            except Exception:
                _LIB = None
        return _LIB


def available() -> bool:
    return _lib() is not None


def _word_size(variant: Variant) -> int:
    return {Variant.BYTE: 1, Variant.WORD: 2,
            Variant.RANS64: 4, Variant.ALIAS: 1}[variant]


def encode(cfg: RansConfig, data: np.ndarray, freqs, cum_freqs):
    """Native encode -> (payload bytes ndarray, per-substream word counts)."""
    lib = _lib()
    assert lib is not None, "native core unavailable"
    data = np.ascontiguousarray(data, dtype=np.uint8)
    freqs32 = np.ascontiguousarray(freqs, dtype=np.uint32)
    cum32 = np.ascontiguousarray(cum_freqs, dtype=np.uint32)
    ws = _word_size(cfg.variant)
    spec = cfg.spec
    max_renorm = 2 if spec.word_bits == 8 else 1
    cap = (data.size * max_renorm + cfg.n_lanes * spec.state_words + 64) * ws
    out = np.empty(cap, np.uint8)
    stream_words = np.zeros(cfg.n_streams, np.int64)
    n = lib.trans_encode(
        int(cfg.variant), cfg.prob_bits, cfg.n_lanes, cfg.lanes_per_stream,
        data, data.size, freqs32, cum32, out, cap, stream_words)
    if n < 0:
        raise RuntimeError(f"trans_encode failed: {n}")
    return out[:n].copy(), stream_words


def decode(cfg: RansConfig, payload: np.ndarray, stream_words: np.ndarray,
           n_symbols: int, freqs, cum_freqs) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "native core unavailable"
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    freqs32 = np.ascontiguousarray(freqs, dtype=np.uint32)
    cum32 = np.ascontiguousarray(cum_freqs, dtype=np.uint32)
    sw = np.ascontiguousarray(stream_words, dtype=np.int64)
    out = np.empty(n_symbols, np.uint8)
    rc = lib.trans_decode(
        int(cfg.variant), cfg.prob_bits, cfg.n_lanes, cfg.lanes_per_stream,
        payload, sw, n_symbols, freqs32, cum32, out)
    if rc != 0:
        raise RuntimeError(f"trans_decode failed: {rc}")
    return out


def build_alias_tables(scale_bits: int, freqs, cum_freqs):
    """Native alias-table builder -> dict of arrays (cross-checked against
    models.alias.make_alias_tables in tests)."""
    lib = _lib()
    assert lib is not None, "native core unavailable"
    freqs32 = np.ascontiguousarray(freqs, dtype=np.uint32)
    cum32 = np.ascontiguousarray(cum_freqs, dtype=np.uint32)
    divider = np.zeros(256, np.uint32)
    slot_freqs = np.zeros(512, np.uint32)
    slot_adjust = np.zeros(512, np.uint32)
    sym_id = np.zeros(512, np.uint8)
    remap = np.zeros(1 << scale_bits, np.uint32)
    rc = lib.trans_build_alias(
        scale_bits, freqs32, cum32, divider, slot_freqs, slot_adjust,
        sym_id, remap)
    if rc != 0:
        raise RuntimeError(f"trans_build_alias failed: {rc}")
    return dict(divider=divider, slot_freqs=slot_freqs,
                slot_adjust=slot_adjust, sym_id=sym_id, alias_remap=remap)
