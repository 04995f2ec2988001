"""Static configuration for the TPU-native rANS framework.

The reference (rygorous/ryg_rans) hard-codes its knobs as compile-time
constants (prob_bits at main.cpp:136 / main_alias.cpp:276, interleave width 2
or 8 at main.cpp:226 / main_simd.cpp:287, L at rans_byte.h:50 / rans64.h:59 /
rans_word_sse41.h:35).  Here they become one frozen dataclass whose fields are
static (hashable) so they can feed `jax.jit` static args and Pallas grid/block
shapes directly.
"""

from __future__ import annotations

import dataclasses
import enum


class Variant(enum.IntEnum):
    """The four codec variants of the reference, as container-format IDs.

    BYTE   - 32-bit state, 8-bit renormalization  (rans_byte.h)
    WORD   - 32-bit state, 16-bit renormalization (rans_word_sse41.h)
    RANS64 - 64-bit state, 32-bit renormalization (rans64.h)
    ALIAS  - BYTE state machine + alias-method O(1) symbol lookup
             (main_alias.cpp:241-267)
    """

    BYTE = 0
    WORD = 1
    RANS64 = 2
    ALIAS = 3


#: One TPU vector register row of lanes.  Kept as a named constant for
#: sub-block substream layouts (``lanes_per_stream=128`` gives one substream
#: per vreg row); the *default* layout is one substream per block
#: (``lanes_per_stream == n_lanes``), which is what the Pallas kernels
#: consume directly.
LANES_PER_STREAM = 128

#: Alphabet size.  The reference assumes 8-bit symbols throughout
#: (rans_word_sse41.h:40, SymbolStats arrays of 256 at main.cpp:51-52).
NSYMS = 256


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    """Arithmetic parameters of one codec variant (all static)."""

    variant: Variant
    state_bits: int      # bits in the coder state
    word_bits: int       # bits emitted/consumed per renorm step
    l_bits: int          # log2(L), lower bound of normalization interval
    max_prob_bits: int   # max supported scale_bits
    # Upper bound on renorm iterations per symbol; renorm loops become this
    # many branchless masked rounds on TPU.
    max_renorm: int

    @property
    def L(self) -> int:
        return 1 << self.l_bits

    @property
    def word_mask(self) -> int:
        return (1 << self.word_bits) - 1

    @property
    def state_words(self) -> int:
        """Words written by a state flush (RansEncFlush analog)."""
        return self.state_bits // self.word_bits


# rans_byte.h:50: L = 1<<23, byte renorm, 31 usable state bits, scale<=16.
# Renorm emits at most 2 bytes per symbol: pre-renorm x < 2^31 and
# x_max = freq << (23 - scale_bits + 8) >= 2^15 when scale_bits <= 16, so two
# 8-bit shifts always suffice.
BYTE_SPEC = VariantSpec(Variant.BYTE, 32, 8, 23, 16, 2)

# rans_word_sse41.h:35-38: L = 1<<16, 16-bit renorm, scale fixed <= 16;
# renorm never iterates (single `if`).
WORD_SPEC = VariantSpec(Variant.WORD, 32, 16, 16, 16, 1)

# rans64.h:59: L = 1<<31, 32-bit renorm, 63 usable bits, scale <= 31;
# renorm never iterates (rans64.h:81-89).
RANS64_SPEC = VariantSpec(Variant.RANS64, 64, 32, 31, 31, 1)

# Alias variant reuses the BYTE state machine (main_alias.cpp:9,241-267).
ALIAS_SPEC = VariantSpec(Variant.ALIAS, 32, 8, 23, 16, 2)

SPECS: dict[Variant, VariantSpec] = {
    Variant.BYTE: BYTE_SPEC,
    Variant.WORD: WORD_SPEC,
    Variant.RANS64: RANS64_SPEC,
    Variant.ALIAS: ALIAS_SPEC,
}

#: Default prob_bits per variant, matching the reference demos
#: (main.cpp:136 = 14, main_simd.cpp RANS_WORD_SCALE_BITS = 12,
#:  main64.cpp:136 = 14, main_alias.cpp:276 = 16).
DEFAULT_PROB_BITS: dict[Variant, int] = {
    Variant.BYTE: 14,
    Variant.WORD: 12,
    Variant.RANS64: 14,
    Variant.ALIAS: 16,
}


@dataclasses.dataclass(frozen=True)
class RansConfig:
    """Full static description of a coded stream.

    ``n_lanes`` generalizes the reference's interleave width (2 at
    main.cpp:226, 8 at main_simd.cpp:287) to thousands of independent states.
    Lanes are partitioned into ``n_streams = n_lanes / lanes_per_stream``
    substreams; each substream carries the flushed states of its lanes
    followed by their interleaved renorm words.  ``lanes_per_stream``
    defaults to ``n_lanes`` (one substream per block -- the layout the TPU
    kernels consume, so default configs route to the Pallas path);
    ``lanes_per_stream=1`` with ``n_lanes in (1, 2)`` reproduces the
    reference's single-bytestream layout bit-for-bit for the
    BYTE/RANS64/ALIAS variants.
    """

    variant: Variant = Variant.WORD
    prob_bits: int = 12
    n_lanes: int = 1024
    lanes_per_stream: int | None = None  # None -> n_lanes (TPU layout)
    block_symbols: int = 1 << 19  # symbols per data-parallel block (VMEM-bounded)
    checksum: bool = True

    def __post_init__(self):
        spec = self.spec
        if self.prob_bits > spec.max_prob_bits:
            raise ValueError(
                f"prob_bits={self.prob_bits} exceeds "
                f"{spec.variant.name} max {spec.max_prob_bits}")
        if self.prob_bits < 8:
            raise ValueError("prob_bits must be >= 8 (alphabet is 256)")
        if self.n_lanes < 1 or self.n_lanes & (self.n_lanes - 1):
            raise ValueError("n_lanes must be a positive power of two")
        if self.block_symbols < self.n_lanes:
            raise ValueError("block_symbols must be >= n_lanes (and a "
                             "crafted 0 would loop the block iterator)")
        if self.lanes_per_stream is None:
            object.__setattr__(self, "lanes_per_stream", self.n_lanes)
        if self.lanes_per_stream & (self.lanes_per_stream - 1):
            raise ValueError("lanes_per_stream must be a power of two")
        if self.lanes_per_stream > self.n_lanes:
            object.__setattr__(self, "lanes_per_stream", self.n_lanes)
        if self.variant == Variant.ALIAS and self.prob_bits < 8:
            raise ValueError("alias variant needs prob_bits >= 8")
        if self.block_symbols % self.n_lanes:
            raise ValueError("block_symbols must be a multiple of n_lanes")

    @property
    def spec(self) -> VariantSpec:
        return SPECS[self.variant]

    @property
    def n_streams(self) -> int:
        return self.n_lanes // self.lanes_per_stream

    @property
    def prob_scale(self) -> int:
        return 1 << self.prob_bits

    @classmethod
    def reference(cls, variant: Variant, n_lanes: int = 1) -> "RansConfig":
        """Config reproducing the reference demo layouts bit-for-bit."""
        return cls(
            variant=variant,
            prob_bits=DEFAULT_PROB_BITS[variant],
            n_lanes=n_lanes,
            lanes_per_stream=n_lanes,
            checksum=False,
        )

    @classmethod
    def auto(cls, n_bytes: int,
             variant: "Variant | None" = None) -> "RansConfig":
        """Size-adaptive config: the shape `compress(data)` uses by default.

        Every extra lane costs ~4 B of flushed state per block (the
        interleave head, docs/FORMAT.md; the reference pays the same 4 B
        per extra state, main.cpp README:62), while decode speed grows
        with lane count up to the tuned 16384 (R=128, docs/DESIGN.md).
        This picks the largest lane count whose per-block head stays under
        ~0.8% of the input (n_lanes <= n_bytes/512), so small inputs get
        ratio-optimal shapes and large inputs converge to the benchmarked
        Pareto point (16384 lanes, 2^23-symbol blocks).

        With no explicit `variant`, large inputs (the ones that reach the
        full 16384-lane shape) get WORD prob_bits=11 -- the headline
        operating point with the r5 byte-plane fetch: fastest decode
        (19.7 GB/s vs ALIAS's 15.8, HEADLINE_TUNE_r05.json) AND the ~3x
        fastest encoder, at +0.16% container size over ALIAS pb16
        (4.5896 vs 4.5821 bits/byte on book1; bench.py measures exactly
        this front-door config).  Smaller inputs stay WORD prob_bits=12
        (better ratio; the pb11 table halving only pays at full width).
        """
        n = 1024
        while n < 16384 and n * 2 * 512 <= max(n_bytes, 1):
            n *= 2
        bs = 4 * n
        while bs < (1 << 23) and bs < max(n_bytes, 1):
            bs *= 2
        if variant is None:
            return cls(variant=Variant.WORD,
                       prob_bits=11 if n == 16384 else 12,
                       n_lanes=n, block_symbols=bs)
        return cls(variant=variant, prob_bits=DEFAULT_PROB_BITS[variant],
                   n_lanes=n, block_symbols=bs)
