"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from ryg_rans_tpu.config import RansConfig, Variant
from ryg_rans_tpu.models import stats
from ryg_rans_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return pmesh.make_mesh(8)


def _cfg():
    # tiny blocks so the interpret-mode kernels stay fast
    return RansConfig(variant=Variant.WORD, prob_bits=12, n_lanes=128,
                      lanes_per_stream=128, block_symbols=2048)


def test_build_model_sharded_matches_host(mesh8, book1_head):
    import jax.numpy as jnp
    data = jnp.asarray(book1_head[:32768])
    freqs, cum = pmesh.build_model_sharded(mesh8, data, 12)
    f2, c2 = stats.build_model(book1_head[:32768], 12)
    assert np.array_equal(freqs, f2)
    assert np.array_equal(cum, c2)


def test_sharded_roundtrip_8dev(mesh8, book1_head):
    import jax.numpy as jnp
    cfg = _cfg()
    n_blocks = 8
    S = n_blocks * cfg.block_symbols  # 16K symbols
    data = np.tile(book1_head, 1)[:S]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    out, (words, n_words) = pmesh.roundtrip_step(
        mesh8, cfg, jnp.asarray(data), freqs, cum, interpret=True)
    assert np.array_equal(np.asarray(out), data)
    # per-block payloads decode independently -> cross-check one block with
    # the numpy oracle
    from ryg_rans_tpu.ops import reference_numpy as oracle
    w = np.asarray(words)[3]
    nw = int(np.asarray(n_words)[3])
    dec = oracle.decode(cfg, [w[:nw].astype(np.uint16)], cfg.block_symbols,
                        freqs, cum)
    assert np.array_equal(dec, data[3 * cfg.block_symbols:
                                    4 * cfg.block_symbols])


def test_sharded_matches_single_device(mesh8, book1_head):
    """The sharded pipeline and the single-device path produce identical
    compressed words (pure data parallelism, no bitstream impact)."""
    import jax.numpy as jnp
    from ryg_rans_tpu.ops import word_tpu
    cfg = _cfg()
    n_blocks = 8
    S = n_blocks * cfg.block_symbols
    data = book1_head[:S]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    _, (words, n_words) = pmesh.roundtrip_step(
        mesh8, cfg, jnp.asarray(data), freqs, cum, interpret=True)
    blocks, _ = word_tpu.encode(cfg, data, freqs, cum, interpret=True)
    for b in range(n_blocks):
        nw = int(np.asarray(n_words)[b])
        assert nw == blocks[b].size
        assert np.array_equal(
            np.asarray(words)[b, :nw].astype(np.uint16), blocks[b])


def test_sharded_roundtrip_ragged_blocks(mesh8, book1_head):
    """Ragged ownership: 9 blocks over 8 devices (VERDICT r4 #5) --
    roundtrip_step pads to the mesh size internally and slices back."""
    import jax.numpy as jnp
    cfg = _cfg()
    n_blocks = 9
    S = n_blocks * cfg.block_symbols
    data = np.tile(book1_head, 1)[:S]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    out, _ = pmesh.roundtrip_step(mesh8, cfg, jnp.asarray(data), freqs, cum,
                                  interpret=True)
    assert out.shape == (S,)
    assert np.array_equal(np.asarray(out), data)


@pytest.mark.parametrize("variant,pb", [
    (Variant.BYTE, 14), (Variant.ALIAS, 16), (Variant.RANS64, 14),
    # two-limb + reciprocal path sharded; dryrun_multichip also runs
    # RANS64 pb=20 on every driver invocation
    pytest.param(Variant.RANS64, 20, marks=pytest.mark.slow),
])
def test_sharded_roundtrip_all_variants(mesh8, book1_head, variant, pb):
    """roundtrip_step is variant-generic (VERDICT r1 #6): every variant's
    full encode->compact->prep->decode pipeline runs inside one shard_map
    body on the 8-device mesh."""
    import jax.numpy as jnp
    cfg = RansConfig(variant=variant, prob_bits=pb, n_lanes=128,
                     lanes_per_stream=128, block_symbols=2048)
    n_blocks = 8
    S = n_blocks * cfg.block_symbols
    data = book1_head[:S]
    freqs, cum = stats.build_model(data, cfg.prob_bits)
    out, _ = pmesh.roundtrip_step(mesh8, cfg, jnp.asarray(data), freqs, cum,
                                  interpret=True)
    assert np.array_equal(np.asarray(out), data)
