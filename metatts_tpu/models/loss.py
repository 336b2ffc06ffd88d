"""FastSpeech2 loss (reference ``lightning/model/loss.py:5-92``).

Masked means are computed as sum(err * mask) / sum(mask) — identical to the
reference's masked_select + mean but with static shapes (no boolean
compaction, which XLA cannot express).  All in float32.
"""

from typing import NamedTuple

import jax.numpy as jnp


class LossValues(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray

    def to_dict(self, prefix=""):
        return {prefix + k: v for k, v in zip(self._fields, self)}


def _masked_l1(pred, target, mask):
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def _masked_mse(pred, target, mask):
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def fastspeech2_loss(batch, output, preprocess_cfg):
    """batch: models.fastspeech2.Batch; output: FS2Output -> LossValues."""
    pitch_level = preprocess_cfg["preprocessing"]["pitch"]["feature"]
    energy_level = preprocess_cfg["preprocessing"]["energy"]["feature"]

    src_valid = output.src_valid
    mel_valid = output.mel_valid

    T = output.mel.shape[1]
    mel_targets = batch.mels[:, :T]

    mel_loss = _masked_l1(output.mel, mel_targets, mel_valid[..., None])
    postnet_loss = _masked_l1(output.postnet_mel, mel_targets,
                              mel_valid[..., None])

    pitch_mask = src_valid if pitch_level == "phoneme_level" else mel_valid
    energy_mask = src_valid if energy_level == "phoneme_level" else mel_valid
    pitch_loss = _masked_mse(output.p_pred, batch.p_targets, pitch_mask)
    energy_loss = _masked_mse(output.e_pred, batch.e_targets, energy_mask)

    log_d_targets = jnp.log(batch.d_targets.astype(jnp.float32) + 1.0)
    duration_loss = _masked_mse(output.log_d_pred, log_d_targets, src_valid)

    total = mel_loss + postnet_loss + duration_loss + pitch_loss + energy_loss
    return LossValues(total, mel_loss, postnet_loss, pitch_loss, energy_loss,
                      duration_loss)
