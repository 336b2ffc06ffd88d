import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatts_tpu.models import (Batch, fastspeech2_init, fastspeech2_apply,
                                fastspeech2_loss)
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, algorithm_cfg,
                     synth_batch, STATS)


@pytest.fixture(scope="module")
def setup():
    mcfg = tiny_model_cfg()
    pcfg = tiny_preprocess_cfg()
    acfg = algorithm_cfg("meta")
    params, state = fastspeech2_init(
        jax.random.PRNGKey(0), pcfg, mcfg, acfg, STATS, n_speakers=4)
    return mcfg, pcfg, acfg, params, state


def test_init_param_tree(setup):
    mcfg, pcfg, acfg, params, state = setup
    assert set(params) == {"encoder", "variance_adaptor", "decoder",
                           "mel_linear", "postnet", "speaker_emb"}
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 10_000


def test_teacher_forced_forward(setup):
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(0))
    out, new_state = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                       train=False)
    B, T, n_mels = batch.mels.shape
    assert out.mel.shape == (B, T, n_mels)
    assert out.postnet_mel.shape == (B, T, n_mels)
    assert out.p_pred.shape == batch.texts.shape
    assert np.isfinite(np.asarray(out.postnet_mel)).all()
    # padded frames (beyond target durations) produce a valid mask
    assert np.array_equal(np.asarray(out.mel_lens), np.asarray(batch.mel_lens))


def test_synthesis_forward_no_targets(setup):
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(1))
    infer = batch._replace(mels=None, mel_lens=None, p_targets=None,
                           e_targets=None, d_targets=None)
    out, _ = fastspeech2_apply(params, state, infer, mcfg, pcfg, acfg,
                               train=False, max_mel_len=32)
    assert out.mel.shape == (2, 32, 8)
    assert out.d_rounded.dtype == jnp.int32
    assert np.isfinite(np.asarray(out.mel)).all()
    # durations predicted, mel_lens derived from them
    assert (np.asarray(out.mel_lens) >= 0).all()


def test_loss_finite_and_positive(setup):
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(2))
    out, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                               train=False)
    losses = fastspeech2_loss(batch, out, pcfg)
    total = float(losses.total)
    assert np.isfinite(total) and total > 0
    parts = sum(float(x) for x in [losses.mel, losses.postnet_mel,
                                   losses.pitch, losses.energy,
                                   losses.duration])
    np.testing.assert_allclose(total, parts, rtol=1e-5)


def test_dropout_rngs_change_output(setup):
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(3))
    out1, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                train=True, rng=jax.random.PRNGKey(1))
    out2, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out1.mel), np.asarray(out2.mel))
    # deterministic in eval
    out3, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                train=False)
    out4, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                train=False)
    np.testing.assert_allclose(np.asarray(out3.mel), np.asarray(out4.mel))


def test_grad_flows_everywhere(setup):
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(4))

    def loss_fn(p):
        out, _ = fastspeech2_apply(p, state, batch, mcfg, pcfg, acfg,
                                   train=False)
        return fastspeech2_loss(batch, out, pcfg).total

    grads = jax.grad(loss_fn)(params)
    for key in ["encoder", "variance_adaptor", "decoder", "mel_linear",
                "postnet", "speaker_emb"]:
        gnorm = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree.leaves(grads[key]))
        assert gnorm > 0, f"no gradient into {key}"


def test_bf16_activation_stream_parity_and_second_order():
    """activation_dtype/attention_scores_dtype=bfloat16 (the TPU training
    defaults) track the fp32 stream closely and keep second-order meta
    gradients finite and nonzero."""
    import jax
    from metatts_tpu.algorithms import get_system
    from helpers import (tiny_preprocess_cfg, tiny_train_cfg, algorithm_cfg,
                         STATS)

    rng = np.random.RandomState(0)
    batch = synth_batch(rng, B=2)

    def build(adtype):
        mcfg = tiny_model_cfg()
        mcfg["activation_dtype"] = adtype
        mcfg["attention_scores_dtype"] = adtype
        return get_system("meta")(tiny_preprocess_cfg(), mcfg,
                                  tiny_train_cfg(), algorithm_cfg("meta"),
                                  stats=STATS, n_speakers=4)

    s32, s16 = build("float32"), build("bfloat16")
    s16.params = s32.params
    o32, _ = s32.adaptor.forward(s32.params, s32.state, batch, train=False,
                                 rng=None)
    o16, _ = s16.adaptor.forward(s16.params, s16.state, batch, train=False,
                                 rng=None)
    d = float(jnp.abs(o32.postnet_mel - o16.postnet_mel).mean())
    scale = float(jnp.abs(o32.postnet_mel).mean())
    assert d / (scale + 1e-9) < 0.05, f"bf16 stream drifted: rel {d/scale}"

    def mloss(p):
        l, _, _ = s16.adaptor.meta_learn(
            p, s16.state, batch, batch, steps=1, lr=1e-3, train=True,
            rng=jax.random.PRNGKey(0))
        return l.total

    g = jax.jit(jax.grad(mloss))(s16.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_einsum_remat_saves_no_score_residuals():
    """The nothing_saveable remat policy on attn_core must actually bound
    residual memory: nothing quadratic in T (the (B, h, T, T) scores /
    probabilities) may be saved for the backward pass, and no input may leak
    in as a closed-over constant that bypasses the policy."""
    try:
        from jax.ad_checkpoint import saved_residuals
    except ImportError:   # public alias absent in this jax version
        from jax._src.ad_checkpoint import saved_residuals
    from metatts_tpu.models.transformer import mha, mha_init

    B, T, D, H = 2, 32, 16, 2
    params = mha_init(jax.random.PRNGKey(0), D, H, D // H, D // H)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)
    valid = jnp.ones((B, T), bool)

    def f(params, x, valid):
        return mha(params, x, valid, H, cdtype=jnp.float32, drop_rate=0.0,
                   train=False, rng=None, attn_impl="einsum_remat").sum()

    quadratic = 0
    for val, src in saved_residuals(f, params, x, valid):
        if hasattr(val, "shape") and val.shape.count(T) >= 2:
            quadratic += 1
        assert "from a constant" not in str(src), (
            f"closed-over residual bypasses remat policy: {src}")
    assert quadratic == 0, "attention scores saved despite nothing_saveable"


def test_synthesis_beyond_max_seq_len(setup):
    """Synthesis past model max_seq_len must extend the positional table on
    the fly (reference transformer/Models.py:82-87,145-153) instead of
    silently truncating."""
    mcfg, pcfg, acfg, params, state = setup
    batch = synth_batch(np.random.RandomState(11))
    batch = batch._replace(mels=None, mel_lens=None, p_targets=None,
                           e_targets=None, d_targets=None)
    want = mcfg["max_seq_len"] + 32
    out, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                               train=False, teacher_forced=False,
                               max_mel_len=want)
    assert out.postnet_mel.shape[1] == want
    assert bool(jnp.isfinite(out.postnet_mel).all())


def test_layer_scan_matches_unrolled():
    """model.layer_scan (lax.scan over stacked FFT-block layers) must be
    bit-identical to the unrolled loop — same per-layer dropout rng folding,
    same math — in both eval and train mode, and under jax.grad."""
    mcfg = tiny_model_cfg()
    mcfg["transformer"].update(encoder_layer=2, decoder_layer=3)
    pcfg, acfg = tiny_preprocess_cfg(), algorithm_cfg("meta")
    params, state = fastspeech2_init(jax.random.PRNGKey(7), pcfg, mcfg,
                                     acfg, STATS, n_speakers=4)
    batch = synth_batch(np.random.RandomState(13))
    scan_cfg = {**mcfg, "layer_scan": True}
    rng = jax.random.PRNGKey(5)

    for train, r in ((False, None), (True, rng)):
        o1, _ = fastspeech2_apply(params, state, batch, mcfg, pcfg, acfg,
                                  train=train, rng=r)
        o2, _ = fastspeech2_apply(params, state, batch, scan_cfg, pcfg,
                                  acfg, train=train, rng=r)
        np.testing.assert_allclose(np.asarray(o1.postnet_mel),
                                   np.asarray(o2.postnet_mel), atol=1e-5)

    def loss(p, cfg):
        out, _ = fastspeech2_apply(p, state, batch, cfg, pcfg, acfg,
                                   train=False)
        return fastspeech2_loss(batch, out, pcfg).total

    g1 = jax.grad(lambda p: loss(p, mcfg))(params)
    g2 = jax.grad(lambda p: loss(p, scan_cfg))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
