"""Cross-lingual (adapt.type=lang) codebook path: per-episode phoneme table
regeneration + meta-gradients into the codebook banks."""

import numpy as np
import jax
import jax.numpy as jnp

from metatts_tpu.algorithms import get_system
from metatts_tpu.models.phoneme_embedding import (phoneme_embedding_init,
                                                  get_new_embedding)
from metatts_tpu.text.symbols import symbols
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     algorithm_cfg, synth_batch, STATS)


def lang_acfg():
    cfg = algorithm_cfg("meta")
    cfg["adapt"]["type"] = "lang"
    cfg["adapt"]["phoneme_emb"] = {
        "type": "codebook", "size": 16, "representation_dim": 12,
        "attention": {"type": "hard"}, "refresh": True,
    }
    return cfg


def test_codebook_hard_attention_table():
    mcfg = tiny_model_cfg()
    acfg = lang_acfg()
    p = phoneme_embedding_init(jax.random.PRNGKey(0), mcfg, acfg)
    vocab = len(symbols) + 1
    ref = np.zeros((vocab, 12), np.float32)
    ref[5] = np.random.RandomState(0).randn(12)
    ref[9] = np.random.RandomState(1).randn(12)
    table = get_new_embedding(p, jnp.asarray(ref), "hard")
    t = np.asarray(table)
    assert t.shape == (vocab, mcfg["transformer"]["encoder_hidden"])
    # rows with representations pick codebook entries; others are zero
    assert np.abs(t[5]).sum() > 0 and np.abs(t[9]).sum() > 0
    assert np.abs(t[4]).sum() == 0 and np.abs(t[0]).sum() == 0
    # picked rows come from emb_banks
    banks = np.asarray(p["emb_banks"])
    assert any(np.allclose(t[5], b) for b in banks)


def test_lang_meta_learn_grads_reach_codebook():
    sys = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                             tiny_train_cfg(), lang_acfg(), stats=STATS,
                             n_speakers=4)
    assert "phn_emb_generator" in sys.params
    rng = np.random.RandomState(0)
    sup = synth_batch(rng, B=2)
    qry = synth_batch(rng, B=2)
    vocab = len(symbols) + 1
    ref = np.zeros((vocab, 12), np.float32)
    for pid in np.unique(np.asarray(sup.texts)):
        ref[pid] = rng.randn(12)
    ref = jnp.asarray(ref)

    def meta_loss(params):
        losses, _, _ = sys.adaptor.meta_learn(
            params, sys.state, sup, qry, steps=1, lr=1e-3, train=True,
            rng=jax.random.PRNGKey(0), phn_ref=ref)
        return losses.total

    g = jax.jit(jax.grad(meta_loss))(sys.params)
    gnorm = float(jnp.abs(g["phn_emb_generator"]["emb_banks"]).sum())
    assert np.isfinite(gnorm) and gnorm > 0
