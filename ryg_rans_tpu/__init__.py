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

__version__ = "0.1.0"
