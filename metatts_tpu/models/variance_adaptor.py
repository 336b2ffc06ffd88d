"""Variance adaptor: duration / pitch / energy prediction + length regulation.

Functional equivalent of the reference ``lightning/model/modules.py:17-250``
with a TPU-native length regulator (see ``ops/length_regulator.py``).
Pitch/energy bins are derived from corpus ``stats.json`` and stored as
non-trainable constants in the params pytree (reference keeps them as
requires_grad=False buffers); ``jnp.searchsorted`` replaces torch.bucketize.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..ops.length_regulator import length_regulate
from ..utils.tools import get_mask_from_lengths


def variance_predictor_init(rng, cfg):
    t = cfg["transformer"]
    v = cfg["variance_predictor"]
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "conv1": nn.conv1d_init(k1, t["encoder_hidden"], v["filter_size"],
                                v["kernel_size"]),
        "ln1": nn.layer_norm_init(v["filter_size"]),
        "conv2": nn.conv1d_init(k2, v["filter_size"], v["filter_size"],
                                v["kernel_size"]),
        "ln2": nn.layer_norm_init(v["filter_size"]),
        "linear": nn.linear_init(k3, v["filter_size"], 1),
    }


def variance_predictor(p, x, valid, *, cdtype, drop_rate, train, rng):
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = jax.nn.relu(nn.conv1d(p["conv1"], x, cdtype))
    h = nn.dropout(r1, nn.layer_norm(p["ln1"], h), drop_rate, train)
    h = jax.nn.relu(nn.conv1d(p["conv2"], h, cdtype))
    h = nn.dropout(r2, nn.layer_norm(p["ln2"], h), drop_rate, train)
    out = nn.linear(p["linear"], h, cdtype)[..., 0]
    return jnp.where(valid, out, 0.0)


def _make_bins(lo, hi, n_bins, quantization):
    if quantization == "log":
        return np.exp(np.linspace(np.log(lo), np.log(hi), n_bins - 1)) \
            .astype(np.float32)
    return np.linspace(lo, hi, n_bins - 1).astype(np.float32)


def variance_adaptor_init(rng, model_cfg, stats):
    """stats: dict with 'pitch': [min,max,mean,std], 'energy': [...] (stats.json)."""
    ve = model_cfg["variance_embedding"]
    d = model_cfg["transformer"]["encoder_hidden"]
    n_bins = ve["n_bins"]
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    return {
        "duration_predictor": variance_predictor_init(k1, model_cfg),
        "pitch_predictor": variance_predictor_init(k2, model_cfg),
        "energy_predictor": variance_predictor_init(k3, model_cfg),
        "pitch_embedding": nn.embedding_init(k4, n_bins, d),
        "energy_embedding": nn.embedding_init(k5, n_bins, d),
        # non-trainable constants (zero-grad; excluded from weight decay)
        "pitch_bins": jnp.asarray(_make_bins(
            stats["pitch"][0], stats["pitch"][1], n_bins,
            ve["pitch_quantization"])),
        "energy_bins": jnp.asarray(_make_bins(
            stats["energy"][0], stats["energy"][1], n_bins,
            ve["energy_quantization"])),
    }


def variance_adaptor_apply(
    p, x, src_valid, model_cfg, preprocess_cfg, *,
    max_mel_len, mel_valid=None,
    p_targets=None, e_targets=None, d_targets=None,
    p_control=1.0, e_control=1.0, d_control=1.0,
    train=False, rng=None,
):
    """Returns (x_expanded, p_pred, e_pred, log_d_pred, d_rounded,
    mel_lens, mel_valid).

    Teacher-forced when targets are given (training), predicted otherwise
    (synthesis) — mirrors reference ``modules.py:102-159``.
    """
    cdtype = jnp.dtype(model_cfg.get("compute_dtype", "float32"))
    drop = model_cfg["variance_predictor"]["dropout"]
    pitch_level = preprocess_cfg["preprocessing"]["pitch"]["feature"]
    energy_level = preprocess_cfg["preprocessing"]["energy"]["feature"]
    r = (jax.random.fold_in(rng, i) if rng is not None else None
         for i in range(4))

    log_d_pred = variance_predictor(
        p["duration_predictor"], x, src_valid,
        cdtype=cdtype, drop_rate=drop, train=train, rng=next(r))

    def add_variance(pred_params, emb_params, bins, target, control, valid, h):
        pred = variance_predictor(pred_params, h, valid, cdtype=cdtype,
                                  drop_rate=drop, train=train, rng=next(r))
        if target is not None:
            value = target
        else:
            pred = pred * control
            value = pred
        emb = nn.embedding(emb_params, jnp.searchsorted(bins, value))
        return pred, h + emb

    p_pred = e_pred = None
    if pitch_level == "phoneme_level":
        p_pred, x = add_variance(p["pitch_predictor"], p["pitch_embedding"],
                                 p["pitch_bins"], p_targets, p_control,
                                 src_valid, x)
    if energy_level == "phoneme_level":
        e_pred, x = add_variance(p["energy_predictor"], p["energy_embedding"],
                                 p["energy_bins"], e_targets, e_control,
                                 src_valid, x)

    if d_targets is not None:
        d_rounded = d_targets
        x, mel_lens = length_regulate(x, d_targets, max_mel_len)
    else:
        d_rounded = jnp.clip(
            jnp.round(jnp.exp(log_d_pred) - 1.0) * d_control, min=0.0
        ).astype(jnp.int32)
        d_rounded = jnp.where(src_valid, d_rounded, 0)
        x, mel_lens = length_regulate(x, d_rounded, max_mel_len)
        mel_valid = get_mask_from_lengths(mel_lens, max_mel_len)

    if pitch_level == "frame_level":
        p_pred, x = add_variance(p["pitch_predictor"], p["pitch_embedding"],
                                 p["pitch_bins"], p_targets, p_control,
                                 mel_valid, x)
    if energy_level == "frame_level":
        e_pred, x = add_variance(p["energy_predictor"], p["energy_embedding"],
                                 p["energy_bins"], e_targets, e_control,
                                 mel_valid, x)

    return x, p_pred, e_pred, log_d_pred, d_rounded, mel_lens, mel_valid
