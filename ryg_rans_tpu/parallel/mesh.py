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
    re-prepare, decode, unpack -- all block-sharded over the mesh, for ANY
    variant (WORD / BYTE / ALIAS / RANS64).

    data_u8 must be padded to n_blocks * block_symbols.  Ragged block
    counts (n_blocks % mesh.size != 0) are handled by padding with zero
    blocks up to the next multiple of the mesh size; the decoded output is
    sliced back to data_u8.size, and the returned word buffers/counts cover
    the padded block count (trailing pad blocks are ignorable).  Returns
    (decoded bytes (sharded array), (compacted word buffers, per-block
    counts)).
    """
    from ..config import Variant
    from ..ops import byte_tpu, rans64_tpu

    R = cfg.n_lanes // 128
    N = cfg.n_lanes
    B = cfg.block_symbols
    n_real = data_u8.size // B
    ndev = mesh.devices.size
    n_blocks = -(-n_real // ndev) * ndev
    if n_blocks != n_real:  # ragged: pad with zero blocks (discarded below)
        pad = jnp.zeros((n_blocks - n_real) * B, data_u8.dtype)
        data_u8 = jnp.concatenate([jnp.asarray(data_u8), pad])
    T4 = B // N // 4
    per = n_blocks // ndev
    ilp = 2 if per % 2 == 0 else 1
    sb = cfg.prob_bits
    variant = cfg.variant

    # Per-variant tables (replicated) and capacities.  The whole
    # encode->compact->prep->decode pipeline runs inside ONE shard_map body:
    # zero communication in the hot loop (SURVEY.md §2.8).
    if variant == Variant.WORD:
        enc_tabs = (jnp.asarray(word_tpu.pack_enc_rows(freqs, cum_freqs,
                                                       sb)),)
        s4, fc = word_tpu.pack_dec_rows2(freqs, cum_freqs, sb)
        dec_tabs = (jnp.asarray(s4), jnp.asarray(fc))
        cap_units = B                     # <=1 u16 word per symbol
        cap_rows = word_tpu.decode_cap_rows(2 * N + B, R)
    elif variant in (Variant.BYTE, Variant.ALIAS):
        enc_tabs = byte_tpu.enc_tables(cfg, freqs, cum_freqs)
        dec_tabs = byte_tpu.dec_tables(cfg, freqs, cum_freqs)
        cap_units = 2 * B                 # <=2 bytes per symbol
        cap_rows = byte_tpu.decode_cap_rows(4 * N + 2 * B, R)
    else:
        recip = sb > 16
        enc_tabs = (jnp.asarray(
            rans64_tpu.pack_enc_tables_recip(freqs, cum_freqs, sb) if recip
            else rans64_tpu.pack_enc_tables(freqs, cum_freqs)),)
        s4, fc = rans64_tpu.pack_dec_tables(freqs, cum_freqs, sb)
        dec_tabs = ((jnp.asarray(s4),) if s4 is not None else ()) \
            + (jnp.asarray(fc),)
        cap_units = B                     # <=1 u32 word per symbol
        cap_rows = rans64_tpu.decode_cap_rows(2 * N + B, R)

    def device_step(*args):
        spk = args[-1]
        n_enc = len(enc_tabs)
        etabs = args[:n_enc]
        dtabs = args[n_enc:-1]
        if variant == Variant.WORD:
            emit, xf = word_tpu.encode_blocks(
                etabs[0], spk, T4=T4, R=R, sb=sb, n_blocks=per,
                interpret=interpret, ilp=ilp)
            words, n_words = word_tpu.compact_emissions(emit, xf, cap_units,
                                                        per)
            x0, stream = word_tpu.prep_decode(words, R, cap_rows, per)
            spk_out = word_tpu.decode_blocks(
                *dtabs, x0, stream, T4=T4, R=R, sb=sb, cap_rows=cap_rows,
                n_blocks=per, interpret=interpret, ilp=ilp)
        elif variant in (Variant.BYTE, Variant.ALIAS):
            alias = variant == Variant.ALIAS
            emit, xf = byte_tpu.encode_blocks(
                etabs, spk, T4=T4, R=R, sb=sb, n_blocks=per, alias=alias,
                interpret=interpret, ilp=ilp)
            words, n_words = byte_tpu.compact_emissions(emit, xf, cap_units,
                                                        per)
            x0, stream = byte_tpu.prep_decode(words, R, cap_rows, per)
            spk_out = byte_tpu.decode_blocks(
                dtabs, x0, stream, T4=T4, R=R, sb=sb, cap_rows=cap_rows,
                n_blocks=per, alias=alias, interpret=interpret, ilp=ilp)
        else:
            ew, ev, xlo, xhi = rans64_tpu.encode_blocks(
                etabs[0], spk, T4=T4, R=R, sb=sb, n_blocks=per,
                interpret=interpret, ilp=ilp, recip=sb > 16)
            words, n_words = rans64_tpu.compact_emissions(ew, ev, xlo, xhi,
                                                          cap_units, per)
            x0lo, x0hi, stream = rans64_tpu.prep_decode(words, R, cap_rows,
                                                        per)
            s4a = dtabs[0] if len(dtabs) == 2 else None
            spk_out = rans64_tpu.decode_blocks(
                s4a, dtabs[-1], x0lo, x0hi, stream, T4=T4, R=R, sb=sb,
                cap_rows=cap_rows, n_blocks=per, interpret=interpret,
                ilp=ilp)
        out = word_tpu.unpack_symbols(spk_out, T4, R, per)
        return out, words, n_words

    spk = word_tpu.pack_symbols(data_u8, T4, R, n_blocks)
    spk = jax.device_put(spk, NamedSharding(mesh, P(DATA_AXIS)))
    n_tabs = len(enc_tabs) + len(dec_tabs)
    f = shard_map(device_step, mesh,
                  in_specs=tuple([P()] * n_tabs) + (P(DATA_AXIS),),
                  out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
    out, words, n_words = f(*enc_tabs, *dec_tabs, spk)
    if n_blocks != n_real:
        out = out[:n_real * B]
    return out, (words, n_words)
