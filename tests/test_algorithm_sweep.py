"""Smoke sweep over EVERY shipped config/algorithm/*.yaml: each config must
load through the validated loader, construct its System, and run one
dev-scale train_step + validation_step (the reference's 31-variant ablation
grid is config-complete; this keeps every variant executable, not just the
handful other tests exercise)."""

import copy
import os

import numpy as np
import pytest

from metatts_tpu import config as C
from metatts_tpu.algorithms import get_system
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     synth_batch, STATS)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALG_DIR = os.path.join(REPO, "config", "algorithm")
ALG_YAMLS = sorted(f for f in os.listdir(ALG_DIR) if f.endswith(".yaml"))

# speaker_emb modes that feed (ref_mels, slice_valid) tuples instead of ids
REF_MEL_MODES = ("encoder", "dvec", "scratch_encoder")


def _shrink(acfg):
    """Dev-scale episode knobs: the sweep exercises each variant's program
    structure (type x adapted modules x speaker mode), not the recipe."""
    acfg = copy.deepcopy(acfg)
    acfg["adapt"]["train"].update(steps=1, shots=2, queries=2,
                                  meta_batch_size=1)
    acfg["adapt"]["task"]["lr"] = 1e-3
    acfg["adapt"]["test"].update(steps=5, saving_steps=[5])
    return acfg


def _batches(acfg, rng):
    dvec_dims = ((2, 16, 8) if acfg["adapt"]["speaker_emb"] in REF_MEL_MODES
                 else None)
    sup = synth_batch(rng, B=2, episode_axis=1, dvec_dims=dvec_dims)
    qry = synth_batch(rng, B=2, episode_axis=1, dvec_dims=dvec_dims)
    return sup, qry


@pytest.mark.parametrize("yaml_name", ALG_YAMLS)
def test_algorithm_yaml_smoke(yaml_name):
    acfg = C.load_algorithm_config(os.path.join(ALG_DIR, yaml_name))
    acfg = _shrink(acfg)
    mcfg_over = {}
    if acfg["adapt"]["speaker_emb"] in REF_MEL_MODES:
        # dev-scale GE2E dims matching _batches's dvec_dims (ref mel
        # channels 8; embed == tiny encoder_hidden 32)
        mcfg_over["ge2e"] = {"mel_channels": 8, "hidden": 16,
                             "embed": 32, "layers": 2}
    system = get_system(acfg["type"])(
        tiny_preprocess_cfg(), tiny_model_cfg(**mcfg_over),
        tiny_train_cfg(), acfg, stats=STATS, n_speakers=4)
    rng = np.random.RandomState(0)
    sup, qry = _batches(acfg, rng)

    if acfg["adapt"]["type"] == "lang" and \
            acfg["adapt"]["phoneme_emb"]["type"] == "codebook":
        # per-episode phoneme-table regeneration needs SSL representations
        import jax.numpy as jnp
        from metatts_tpu.text.symbols import symbols
        vocab = len(symbols) + 1
        d_feat = acfg["adapt"]["phoneme_emb"]["representation_dim"]
        ref = np.zeros((1, vocab, d_feat), np.float32)
        for pid in np.unique(np.asarray(sup.texts)):
            ref[0, pid] = rng.randn(d_feat)
        losses = system.train_step(sup, qry, phn_ref=jnp.asarray(ref))
    elif acfg["type"] == "baseline":
        import jax
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])
            if hasattr(x, "shape") else x, sup)
        losses = system.train_step(flat)
    else:  # meta / imaml
        losses = system.train_step(sup, qry)
    assert np.isfinite(float(losses.total)), yaml_name

    import jax
    sup1 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") else x, sup)
    qry1 = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") else x, qry)
    val = system.validation_step(sup1, qry1)
    assert np.isfinite(float(val.total)), yaml_name
