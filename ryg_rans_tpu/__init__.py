"""ryg_rans_tpu: a TPU-native rANS entropy-coding framework.

From-scratch JAX/Pallas re-design of the capability surface of
rygorous/ryg_rans: byte-aligned, word-based, and 64-bit rANS variants plus
alias-method symbol lookup, generalized from the reference's 2-way / 8-way
SSE interleaving to thousands of independent coder lanes per chip and
block-parallel scale-out across device meshes.
"""

from .config import (  # noqa: F401
    RansConfig,
    Variant,
    BYTE_SPEC,
    WORD_SPEC,
    RANS64_SPEC,
    ALIAS_SPEC,
    LANES_PER_STREAM,
)


def compress(data, cfg=None, backend="auto") -> bytes:
    """Compress bytes/uint8 array -> TRNS container (see api.compress)."""
    from . import api
    return api.compress(data, cfg, backend)


def decompress(blob, backend="auto") -> bytes:
    """Decompress a TRNS container -> original bytes (see api.decompress)."""
    from . import api
    return api.decompress(blob, backend)


def compress_from_device(arr, cfg=None) -> bytes:
    """Compress a device-resident uint8 array on-chip -> TRNS container
    (see api.compress_from_device)."""
    from . import api
    return api.compress_from_device(arr, cfg)


def decompress_to_device(blob):
    """Decode a TRNS container into a device-resident uint8 array
    (see api.decompress_to_device)."""
    from . import api
    return api.decompress_to_device(blob)


__version__ = "0.1.0"
