"""Fused FFT-block inference megakernel (ops/pallas/fftblock.py), interpret
mode: parity with the XLA eval-mode block, masking behavior, serve gating."""

import numpy as np
import jax
import jax.numpy as jnp

from metatts_tpu.models.transformer import fft_block_init, fft_block
from metatts_tpu.ops.pallas.fftblock import (fused_fft_block,
                                             fused_block_supported)


def _setup(D=256, H=2, F=512, K=9, B=3, T=64, seed=0):
    p = fft_block_init(jax.random.PRNGKey(seed), D, H, D // H, D // H, F,
                       [K, 1])
    x = jnp.asarray(np.random.RandomState(seed).randn(B, T, D), jnp.float32)
    lens = np.array([T, T - 24, T // 4])[:B]
    valid = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    return p, x, valid, H


def test_fused_block_matches_xla_eval():
    p, x, valid, H = _setup()
    ref = fft_block(p, x, valid, H, cdtype=jnp.bfloat16, drop_rate=0.0,
                    train=False, rng=None)
    got = fused_fft_block(p, x, valid, H, interpret=True)
    d = float(jnp.abs(ref - got).max())
    s = float(jnp.abs(ref).max())
    assert d / s < 5e-3, f"fused block diverged: rel {d / s}"


def test_fused_block_zeroes_padding():
    p, x, valid, H = _setup()
    out = np.asarray(fused_fft_block(p, x, valid, H, interpret=True))
    v = np.asarray(valid)
    assert np.abs(out[~v]).max() == 0.0
    assert np.abs(out[v]).max() > 0.0


def test_fused_block_mask_invariance():
    """Padded positions must not influence valid outputs."""
    p, x, valid, H = _setup()
    x2 = x.at[1, 50:].set(1e3)      # garbage beyond row 1's length (40)
    a = fused_fft_block(p, x, valid, H, interpret=True)
    b = fused_fft_block(p, x2, valid, H, interpret=True)
    assert float(jnp.abs(a[1, :40] - b[1, :40]).max()) < 1e-5


def test_supported_gate():
    assert fused_block_supported(256, 128)
    assert not fused_block_supported(200, 100)   # not MXU-tileable


def test_serve_uses_fused_path_under_interpret_flag():
    """The serve engine's synthesis jit routes through the megakernel when
    the (test-only) interpret escape hatch forces the gate open on CPU."""
    from metatts_tpu.models import transformer as T
    from helpers import tiny_model_cfg
    calls = {"n": 0}
    orig = fused_fft_block

    def spy(*a, **k):
        calls["n"] += 1
        k.setdefault("interpret", True)
        return orig(*a, **k)

    mcfg = tiny_model_cfg()
    mcfg["transformer"].update(encoder_hidden=256, decoder_hidden=256,
                               encoder_head=2, decoder_head=2)
    mcfg["_fused_infer"] = True
    mcfg["_fused_interpret"] = True
    import metatts_tpu.ops.pallas.fftblock as FB
    FB_orig = FB.fused_fft_block
    FB.fused_fft_block = spy
    try:
        p = fft_block_init(jax.random.PRNGKey(0), 256, 2, 128, 128, 512,
                           [9, 1])
        enc = {"src_word_emb": {"table": jnp.zeros((361, 256))},
               "layers": [p]}
        texts = jnp.zeros((2, 16), jnp.int32)
        valid = jnp.ones((2, 16), bool)
        from metatts_tpu.models.transformer import (encoder_apply,
                                                    sinusoid_table)
        out = encoder_apply(enc, texts, valid, mcfg, train=False, rng=None,
                            pos_table=jnp.asarray(sinusoid_table(16, 256)))
        assert calls["n"] == 1 and out.shape == (2, 16, 256)
        # train=True must NEVER take the fused (non-differentiable) path
        calls["n"] = 0
        encoder_apply(enc, texts, valid, mcfg, train=True,
                      rng=jax.random.PRNGKey(0),
                      pos_table=jnp.asarray(sinusoid_table(16, 256)))
        assert calls["n"] == 0
    finally:
        FB.fused_fft_block = FB_orig
