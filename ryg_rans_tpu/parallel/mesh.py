"""Mesh-level data parallelism: block-sharded encode/decode.

The reference's only parallelism is intra-core interleaving (SURVEY.md §2.8);
chip- and host-level scale-out here is pure data parallelism over independent
blocks: the frequency table is tiny and replicated, each device en/decodes
its own blocks with ZERO communication in the hot loop, and outputs are
gathered in block order.  Collectives appear only in model building (one
psum over per-shard histograms) and at the output gather -- both ride
ICI/DCN outside the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # metadata, and every body here is embarrassingly block-parallel.
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=False)

from ..config import RansConfig
from ..ops import word_tpu

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # Default backend too small (e.g. one real chip): fall back to the
        # virtual CPU device set (xla_force_host_platform_device_count).
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            pass  # no CPU backend either; fall through to the clear error
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def build_model_sharded(mesh: Mesh, data, prob_bits: int):
    """Device-side histogram with a psum across the data axis, then exact
    normalization on host (normalize is sequential integer logic,
    main.cpp:75-129, and runs on 257 values -- not worth a device port)."""
    from ..models import stats

    def hist(shard):
        h = stats.count_freqs_jax(shard)
        return jax.lax.psum(h, DATA_AXIS)

    counts = shard_map(hist, mesh, in_specs=P(DATA_AXIS), out_specs=P())(data)
    return stats.normalize_freqs(np.asarray(counts).astype(np.uint32),
                                 1 << prob_bits)


def decode_blocks_sharded(mesh: Mesh, sym4_rows, fc_rows, x0, stream2, *,
                          T4: int, R: int, sb: int, cap_rows: int,
                          n_blocks: int, interpret: bool = False):
    """Block-parallel decode across the mesh.

    x0 (n_blocks*R, 128) and stream2 (n_blocks*cap_rows, 128) are sharded on
    their block dimension; tables replicate; output symbols come back
    sharded on blocks (gather happens only if the caller asks for them
    unsharded).
    """
    ndev = mesh.devices.size
    if n_blocks % ndev:
        raise ValueError(f"n_blocks={n_blocks} not divisible by {ndev} devices")
    per = n_blocks // ndev

    def body(s4, fc, x0l, stl):
        return word_tpu.decode_blocks(
            s4, fc, x0l, stl, T4=T4, R=R, sb=sb, cap_rows=cap_rows,
            n_blocks=per, interpret=interpret,
            ilp=2 if per % 2 == 0 else 1)

    f = shard_map(body, mesh,
                  in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
                  out_specs=P(DATA_AXIS))
    return f(sym4_rows, fc_rows, x0, stream2)


def encode_blocks_sharded(mesh: Mesh, enc_rows, syms_packed, *, T4: int,
                          R: int, sb: int, n_blocks: int,
                          interpret: bool = False):
    """Block-parallel dense encode across the mesh (compaction stays
    per-device too; only the container assembly concatenates on host)."""
    ndev = mesh.devices.size
    if n_blocks % ndev:
        raise ValueError(f"n_blocks={n_blocks} not divisible by {ndev} devices")
    per = n_blocks // ndev

    def body(enc, spk):
        emit, xf = word_tpu.encode_blocks(
            enc, spk, T4=T4, R=R, sb=sb, n_blocks=per, interpret=interpret)
        return emit, xf

    f = shard_map(body, mesh,
                  in_specs=(P(), P(DATA_AXIS)),
                  out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    return f(enc_rows, syms_packed)


def compact_sharded(mesh: Mesh, emit, x_final, cap_words: int,
                    n_blocks: int):
    """Per-device emission compaction; word buffers return block-sharded."""
    ndev = mesh.devices.size
    per = n_blocks // ndev

    def body(e, xf):
        return word_tpu.compact_emissions(e, xf, cap_words, per)

    f = shard_map(body, mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                  out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    return f(emit, x_final)


def roundtrip_step(mesh: Mesh, cfg: RansConfig, data_u8, freqs, cum_freqs,
                   interpret: bool = False):
    """One full sharded encode->decode step (the framework's analog of a
    'training step' for the multi-chip dry run): pack, encode, compact,
    re-prepare, decode, unpack -- all block-sharded over the mesh.

    data_u8 must be padded to n_blocks * block_symbols with
    n_blocks % mesh.size == 0.  Returns the decoded bytes (sharded array).
    """
    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    B = cfg.block_symbols
    n_blocks = data_u8.size // B
    T4 = B // N // 4
    cap_words = B
    cap_rows = word_tpu.decode_cap_rows(2 * N + B, R)

    enc_rows = jnp.asarray(word_tpu.pack_enc_rows(freqs, cum_freqs,
                                                  cfg.prob_bits))
    s4, fc = word_tpu.pack_dec_rows2(freqs, cum_freqs, cfg.prob_bits)
    sym4_rows, fc_rows = jnp.asarray(s4), jnp.asarray(fc)

    spk = word_tpu.pack_symbols(data_u8, T4, R, n_blocks)
    spk = jax.device_put(
        spk, NamedSharding(mesh, P(DATA_AXIS)))
    emit, xf = encode_blocks_sharded(mesh, enc_rows, spk, T4=T4, R=R,
                                     sb=cfg.prob_bits, n_blocks=n_blocks,
                                     interpret=interpret)
    words, n_words = compact_sharded(mesh, emit, xf, cap_words, n_blocks)

    ndev = mesh.devices.size
    per = n_blocks // ndev

    def prep(w):
        return word_tpu.prep_decode(w, R, cap_rows, per)

    x0, stream2 = shard_map(prep, mesh, in_specs=P(DATA_AXIS),
                            out_specs=(P(DATA_AXIS), P(DATA_AXIS)))(words)
    spk_out = decode_blocks_sharded(
        mesh, sym4_rows, fc_rows, x0, stream2, T4=T4, R=R, sb=cfg.prob_bits,
        cap_rows=cap_rows, n_blocks=n_blocks, interpret=interpret)

    def unpack(s):
        return word_tpu.unpack_symbols(s, T4, R, per)

    out = shard_map(unpack, mesh, in_specs=P(DATA_AXIS),
                    out_specs=P(DATA_AXIS))(spk_out)
    return out, (words, n_words)
