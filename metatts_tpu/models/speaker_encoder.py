"""Speaker conditioning (reference ``lightning/model/speaker_encoder.py``).

Modes (selected by ``algorithm.adapt.speaker_emb``):
  * ``table``   — per-speaker embedding rows (n_speakers x hidden);
  * ``shared``  — single shared row;
  * ``encoder`` / ``scratch_encoder`` — trainable GE2E d-vector LSTM over
    reference-mel slices (resemblyzer architecture: 3x LSTM-256 over 40-mel
    partials -> linear -> relu -> slice-mean -> L2 norm);
  * ``dvec``    — same network, frozen (stop-gradient).

The reference's ``encoder``/``dvec`` modes load resemblyzer's pretrained
weights; here the same architecture initializes randomly and a converter
(``from_torch_state``) can ingest exported weights.
"""

import jax
import jax.numpy as jnp

from . import nn

GE2E_MEL_CHANNELS = 40
GE2E_HIDDEN = 256
GE2E_EMBED = 256
GE2E_LAYERS = 3


def ge2e_dims(model_cfg):
    """(mel_channels, hidden, embed, layers) — defaults are the resemblyzer
    pretrained layout; ``model.ge2e`` overrides them for dev-scale tests
    (embed must equal the transformer hidden for the additive speaker
    conditioning, as it does at base scale: 256 == 256)."""
    g = model_cfg.get("ge2e", {})
    return (g.get("mel_channels", GE2E_MEL_CHANNELS),
            g.get("hidden", GE2E_HIDDEN),
            g.get("embed", GE2E_EMBED),
            g.get("layers", GE2E_LAYERS))


def speaker_encoder_init(rng, model_cfg, algorithm_cfg, n_speakers):
    if not model_cfg["multi_speaker"]:
        return None
    emb_type = algorithm_cfg["adapt"]["speaker_emb"]
    d = model_cfg["transformer"]["encoder_hidden"]
    if emb_type == "table":
        return {"table": nn.embedding_init(rng, n_speakers, d)["table"]}
    if emb_type == "shared":
        return {"table": nn.embedding_init(rng, 1, d)["table"]}
    if emb_type in ("encoder", "dvec", "scratch_encoder"):
        mel_c, hidden, embed, layers = ge2e_dims(model_cfg)
        k1, k2 = jax.random.split(rng)
        return {
            "lstm": nn.lstm_init(k1, mel_c, hidden, layers),
            "linear": nn.linear_init(k2, hidden, embed),
        }
    raise ValueError(f"unknown speaker_emb {emb_type!r}")


def ge2e_embed(p, mels, cdtype=jnp.float32):
    """(N, T, 40) partial-slice mels -> (N, 256) L2-normalized d-vectors."""
    _, finals = nn.lstm(p["lstm"], mels, cdtype)
    h = finals[-1]                                     # last layer's h_T
    e = jax.nn.relu(nn.linear(p["linear"], h, cdtype))
    # sqrt(sum+eps) normalization, NOT linalg.norm: when relu kills every
    # unit of an embedding (sparse codes late in GE2E training) norm's VJP
    # at the exact-zero vector is 0/0 -> NaN even under a maximum() value
    # guard, and one such partial NaNs the whole scratch-GE2E training run
    # (finite loss, NaN grads).  This form's gradient at e=0 is 0.
    return e / jnp.sqrt(jnp.sum(e * e, axis=-1, keepdims=True) + 1e-12)


def speaker_encoder_apply(p, speaker_args, emb_type, cdtype=jnp.float32):
    """Returns (B, H) speaker embeddings.

    speaker_args: (B,) int speaker ids for table/shared; for the d-vector
    modes a pair ``(ref_mels (B, S, T, 40), slice_valid (B, S) bool)`` —
    fixed-count padded slices replacing the reference's ragged slice lists
    (``speaker_encoder.py:71-76``).
    """
    if emb_type == "table":
        return jnp.take(p["table"], speaker_args, axis=0)
    if emb_type == "shared":
        return jnp.broadcast_to(p["table"][0], (speaker_args.shape[0],
                                                p["table"].shape[1]))
    if emb_type in ("encoder", "dvec", "scratch_encoder"):
        if emb_type == "dvec":
            p = jax.lax.stop_gradient(p)
        ref_mels, slice_valid = speaker_args
        B, S, T, C = ref_mels.shape
        partial = ge2e_embed(p, ref_mels.reshape(B * S, T, C), cdtype)
        partial = partial.reshape(B, S, -1)
        w = slice_valid.astype(jnp.float32)[..., None]
        mean = jnp.sum(partial * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1e-8)
        return mean / jnp.maximum(
            jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-8)
    raise ValueError(f"unknown speaker_emb {emb_type!r}")
