import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatts_tpu.ops.pallas.attention import flash_attention


def _reference(q, k, v, mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    s = jnp.where(mask[:, None, :] > 0, s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    BH, T, D = 4, 512, 128
    q = rng.randn(BH, T, D).astype(np.float32) * 0.5
    k = rng.randn(BH, T, D).astype(np.float32) * 0.5
    v = rng.randn(BH, T, D).astype(np.float32)
    mask = np.ones((BH, T), np.float32)
    mask[0, 300:] = 0.0          # padded keys
    mask[2, 100:] = 0.0
    return tuple(jnp.asarray(x) for x in (q, k, v, mask))


def test_forward_matches_reference(inputs):
    q, k, v, mask = inputs
    out = flash_attention(q, k, v, mask, 256, True)
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_reference(inputs):
    q, k, v, mask = inputs

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, 256, True)
        return jnp.sum(out * jnp.cos(out))   # nontrivial cotangent

    def loss_ref(q, k, v):
        out = _reference(q, k, v, mask)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch")


def test_second_order_raises_and_model_falls_back(inputs):
    """custom_vjp kernels are once-differentiable by design; the MAML inner
    loop must therefore run with attn_impl='einsum' (adapt.py enforces
    this).  Document both halves."""
    q, k, v, mask = inputs
    q, k, v, m = q[:1, :256], k[:1, :256], v[:1, :256], mask[:1, :256]

    def inner(qq):
        return jnp.sum(flash_attention(qq, k, v, m, 256, True) ** 2)

    with pytest.raises(Exception):
        jax.grad(lambda qq: jnp.sum(jax.grad(inner)(qq) ** 2))(q)

    # the model-level second-order path (einsum override) works:
    from metatts_tpu.algorithms.adapt import Adaptor
    import sys as _s
    _s.path.insert(0, "tests")
    from helpers import (tiny_model_cfg, tiny_preprocess_cfg, algorithm_cfg,
                         synth_batch, STATS)
    from metatts_tpu.models.fastspeech2 import fastspeech2_init
    mcfg = tiny_model_cfg()
    mcfg["attention_impl"] = "flash"  # even when flash is forced globally
    pcfg, acfg = tiny_preprocess_cfg(), algorithm_cfg("meta")
    params, state = fastspeech2_init(jax.random.PRNGKey(0), pcfg, mcfg,
                                     acfg, STATS, 4)
    adaptor = Adaptor(pcfg, mcfg, acfg)
    sup = synth_batch(np.random.RandomState(0), B=2)

    def meta(p):
        # note: flash in interpret mode is slow on CPU; tiny shapes only.
        adapted = adaptor.adapt(p, state, sup, steps=1, lr=1e-3,
                                first_order=False, train=False, rng=None)
        out, _ = adaptor.forward(
            adapted, state, sup, train=False,
            mcfg={**mcfg, "attention_impl": "einsum"})
        return adaptor.loss(sup, out).total

    g = jax.grad(meta)(params)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(g["decoder"])[0])).all()


def test_bf16_inputs_forward_and_grads(inputs):
    """Dtype-generic kernel: bf16 q/k/v run bf16 MXU contractions with fp32
    softmax stats; output fp32, cotangents bf16, both tracking the fp32
    reference to bf16 tolerance."""
    q, k, v, mask = inputs
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, mask, 256, True)
    assert out.dtype == jnp.float32
    ref = _reference(q, k, v, mask)
    assert float(jnp.abs(out - ref).max()) < 3e-2

    def loss(q_, k_, v_):
        return (flash_attention(q_, k_, v_, mask, 256, True) ** 2).sum()

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    assert gq.dtype == gk.dtype == gv.dtype == jnp.bfloat16

    def ref_loss(q_, k_, v_):
        return (_reference(q_, k_, v_, mask) ** 2).sum()

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r in ((gq, rq), (gk, rk), (gv, rv)):
        rel = float(jnp.abs(g.astype(jnp.float32) - r).max()) / (
            float(jnp.abs(r).max()) + 1e-9)
        assert rel < 0.05, f"bf16 grad drift {rel}"
