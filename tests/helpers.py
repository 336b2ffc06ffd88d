"""Shared test fixtures: tiny configs and synthetic batches."""

import copy

import numpy as np
import jax.numpy as jnp

from metatts_tpu import config as C
from metatts_tpu.models.fastspeech2 import Batch

STATS = {"pitch": [-2.0, 8.0, 0.0, 1.0], "energy": [-1.5, 8.0, 0.0, 1.0]}


def tiny_model_cfg(**over):
    cfg = copy.deepcopy(C.MODEL_DEFAULTS)
    cfg["transformer"].update(
        encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, encoder_head=2, decoder_head=2,
        conv_filter_size=48)
    cfg["variance_predictor"].update(filter_size=16)
    cfg["variance_embedding"].update(n_bins=16)
    cfg["max_seq_len"] = 64
    cfg["compute_dtype"] = "float32"
    cfg["activation_dtype"] = "float32"
    cfg["attention_scores_dtype"] = "float32"
    cfg["remat"] = False
    cfg.update(over)
    return cfg


def tiny_preprocess_cfg():
    cfg = copy.deepcopy(C.PREPROCESS_DEFAULTS)
    cfg["preprocessing"]["mel"]["n_mel_channels"] = 8
    return cfg


def tiny_train_cfg():
    cfg = copy.deepcopy(C.TRAIN_DEFAULTS)
    # short warmup so a dozen test steps see a usable learning rate
    cfg["optimizer"]["warm_up_step"] = 50
    return cfg


def algorithm_cfg(alg_type="meta", **adapt_over):
    cfg = copy.deepcopy(C.ALGORITHM_DEFAULTS)
    cfg["type"] = alg_type
    cfg["adapt"]["train"].update(steps=2, shots=2, queries=2,
                                 meta_batch_size=2)
    cfg["adapt"]["test"].update(steps=10, saving_steps=[5, 10])
    cfg["adapt"].update(adapt_over)
    return cfg


def synth_batch(rng, B=2, L=12, T=48, n_mels=8, n_speakers=4,
                episode_axis=None, dvec_dims=None):
    """Teacher-forced batch with consistent durations summing to <= T.

    ``dvec_dims=(S, T_ref, C_ref)`` emits tuple speaker_args
    ``(ref_mels (B,S,T_ref,C_ref), slice_valid (B,S))`` for the
    encoder/dvec/scratch_encoder speaker modes."""
    def one(shape=None):
        d = rng.randint(1, 5, size=(B, L)).astype(np.int32)
        # scale durations so totals are <= T
        totals = d.sum(-1)
        mel_lens = np.minimum(totals, T).astype(np.int32)
        texts = rng.randint(1, 360, size=(B, L)).astype(np.int32)
        src_lens = np.full((B,), L, np.int32)
        mels = rng.randn(B, T, n_mels).astype(np.float32)
        pitch = rng.randn(B, L).astype(np.float32)
        energy = rng.randn(B, L).astype(np.float32)
        speakers = rng.randint(0, n_speakers, size=(B,)).astype(np.int32)
        if dvec_dims:
            S, T_ref, C_ref = dvec_dims
            ref = rng.randn(B, S, T_ref, C_ref).astype(np.float32)
            valid = np.ones((B, S), bool)
            if S > 1:
                valid[:, -1] = rng.rand(B) > 0.5   # ragged slice counts
            speaker_args = (jnp.asarray(ref), jnp.asarray(valid))
        else:
            speaker_args = jnp.asarray(speakers)
        return Batch(
            speaker_args=speaker_args,
            texts=jnp.asarray(texts),
            src_lens=jnp.asarray(src_lens),
            mels=jnp.asarray(mels),
            mel_lens=jnp.asarray(mel_lens),
            p_targets=jnp.asarray(pitch),
            e_targets=jnp.asarray(energy),
            d_targets=jnp.asarray(d),
        )

    if episode_axis:
        import jax
        batches = [one() for _ in range(episode_axis)]
        # tree-aware stack (speaker_args may be a (ref_mels, valid) tuple)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    return one()
