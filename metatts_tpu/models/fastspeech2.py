"""FastSpeech2 acoustic model as a pure (init, apply) pair.

Data flow (reference ``lightning/model/fastspeech2.py:40-112``):
    encoder -> +speaker_emb -> variance adaptor (pitch/energy/duration +
    length regulate) -> +speaker_emb -> decoder -> mel_linear -> +postnet.

Top-level params keys {encoder, speaker_emb, variance_adaptor, decoder,
mel_linear, postnet} are the unit of meta-adaptation: ``algorithm.adapt.
modules`` selects which sub-pytrees the inner loop updates, matching the
reference's ModuleDict-of-adapted-modules (``base_adaptor.py:31-35``).

Static-shape contract: ``texts`` padded to a src bucket, mels padded to
``max_seq_len`` (1000); the batch carries true lengths.  One XLA program per
(src_bucket, mel_bucket, teacher_forced) combination.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import nn
from .transformer import (encoder_init, encoder_apply, decoder_init,
                          decoder_apply, postnet_init, postnet_apply,
                          sinusoid_table)
from .variance_adaptor import variance_adaptor_init, variance_adaptor_apply
from .speaker_encoder import speaker_encoder_init, speaker_encoder_apply
from ..utils.tools import get_mask_from_lengths

ADAPT_MODULE_KEYS = ("encoder", "speaker_emb", "variance_adaptor", "decoder",
                     "mel_linear", "postnet")


class Batch(NamedTuple):
    """Typed equivalent of the reference 12-tuple (``lightning/collate.py:47-60``).

    ids / raw_texts live host-side (not traced); numeric fields are arrays.
    Static lengths are carried by the array shapes themselves (texts is
    padded to the src bucket, mels to the mel bucket), so a Batch is a clean
    pytree for vmap / scan / shard_map.
    """
    speaker_args: Any             # (B,) int32 or (ref_mels, slice_valid)
    texts: Any                    # (B, L) int32
    src_lens: Any                 # (B,) int32
    mels: Optional[Any] = None    # (B, T, n_mels) float32
    mel_lens: Optional[Any] = None
    p_targets: Optional[Any] = None
    e_targets: Optional[Any] = None
    d_targets: Optional[Any] = None


class FS2Output(NamedTuple):
    mel: Any
    postnet_mel: Any
    p_pred: Any
    e_pred: Any
    log_d_pred: Any
    d_rounded: Any
    src_valid: Any                # True at valid positions
    mel_valid: Any
    src_lens: Any
    mel_lens: Any


def fastspeech2_init(rng, preprocess_cfg, model_cfg, algorithm_cfg,
                     stats, n_speakers):
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    t = model_cfg["transformer"]
    n_mels = preprocess_cfg["preprocessing"]["mel"]["n_mel_channels"]
    params = {
        "encoder": encoder_init(k1, model_cfg),
        "variance_adaptor": variance_adaptor_init(k2, model_cfg, stats),
        "decoder": decoder_init(k3, model_cfg),
        "mel_linear": nn.linear_init(k4, t["decoder_hidden"], n_mels),
    }
    postnet_params, postnet_state = postnet_init(k5, n_mels)
    params["postnet"] = postnet_params
    spk = speaker_encoder_init(k6, model_cfg, algorithm_cfg, n_speakers)
    if spk is not None:
        params["speaker_emb"] = spk
    state = {"postnet": postnet_state}
    return params, state


def fastspeech2_apply(
    params, state, batch: Batch, model_cfg, preprocess_cfg, algorithm_cfg,
    *, train=False, rng=None, teacher_forced=None, max_mel_len=None,
    p_control=1.0, e_control=1.0, d_control=1.0,
    average_spk_emb=False,
) -> tuple:
    """Forward pass. Returns (FS2Output, new_state).

    teacher_forced defaults to "targets present" like the reference; pass
    False to force the synthesis path even when targets are in the batch.
    max_mel_len (static) caps synthesis length; defaults to mels' length or
    model max_seq_len.
    """
    cdtype = jnp.dtype(model_cfg.get("compute_dtype", "float32"))
    if teacher_forced is None:
        teacher_forced = batch.d_targets is not None
    if max_mel_len is None:
        max_mel_len = (batch.mels.shape[1] if batch.mels is not None
                       else model_cfg["max_seq_len"])
    if train or teacher_forced:
        # reference truncates over-long decoder inputs at train time
        # (transformer/Models.py:154-162)
        max_mel_len = min(max_mel_len, model_cfg["max_seq_len"])
    # else: synthesis may request max_mel_len beyond max_seq_len — the
    # sinusoid table below is generated at trace time for the full length
    # (reference extends the PE table on the fly at inference,
    # transformer/Models.py:82-87,145-153); static shapes are preserved
    # because max_mel_len is a Python int.

    src_valid = get_mask_from_lengths(batch.src_lens, batch.texts.shape[1])
    mel_valid = (get_mask_from_lengths(batch.mel_lens, max_mel_len)
                 if batch.mel_lens is not None else None)

    pos_table = jnp.asarray(
        sinusoid_table(max(model_cfg["max_seq_len"], max_mel_len) + 1,
                       model_cfg["transformer"]["encoder_hidden"]))

    r_enc, r_va, r_dec, r_post = (
        jax.random.split(rng, 4) if rng is not None else (None,) * 4)

    x = encoder_apply(params["encoder"], batch.texts, src_valid, model_cfg,
                      train=train, rng=r_enc, pos_table=pos_table)

    spk_emb = None
    if "speaker_emb" in params:
        spk_emb = speaker_encoder_apply(
            params["speaker_emb"], batch.speaker_args,
            algorithm_cfg["adapt"]["speaker_emb"], cdtype)
        if average_spk_emb:
            # query synthesis conditions on the mean support embedding
            # (reference ``base_adaptor.py:84-90``); support count may
            # differ from the query batch size, hence the re-broadcast.
            spk_emb = jnp.broadcast_to(
                jnp.mean(spk_emb, axis=0, keepdims=True),
                (x.shape[0], spk_emb.shape[-1]))
        elif spk_emb.shape[0] != x.shape[0]:
            raise ValueError("speaker_args batch mismatch")
        x = x + spk_emb[:, None, :]

    (x, p_pred, e_pred, log_d_pred, d_rounded, mel_lens, mel_valid) = \
        variance_adaptor_apply(
            params["variance_adaptor"], x, src_valid, model_cfg,
            preprocess_cfg,
            max_mel_len=max_mel_len, mel_valid=mel_valid,
            p_targets=batch.p_targets if teacher_forced else None,
            e_targets=batch.e_targets if teacher_forced else None,
            d_targets=batch.d_targets if teacher_forced else None,
            p_control=p_control, e_control=e_control, d_control=d_control,
            train=train, rng=r_va)

    if spk_emb is not None:
        x = x + spk_emb[:, None, :]

    x = decoder_apply(params["decoder"], x, mel_valid, model_cfg,
                      train=train, rng=r_dec, pos_table=pos_table)
    mel = nn.linear(params["mel_linear"], x, cdtype)
    residual, post_state = postnet_apply(
        params["postnet"], state["postnet"], mel,
        cdtype=cdtype, train=train, rng=r_post)
    postnet_mel = mel + residual

    out = FS2Output(mel, postnet_mel, p_pred, e_pred, log_d_pred, d_rounded,
                    src_valid, mel_valid, batch.src_lens, mel_lens)
    return out, {"postnet": post_state}
