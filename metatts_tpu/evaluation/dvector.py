"""Speaker d-vector encoder for evaluation (resemblyzer equivalent).

The reference evaluation pipeline embeds real / reconstructed / synthesized
wavs with resemblyzer's pretrained GE2E VoiceEncoder
(``evaluation/wavs_to_dvector.py:18``).  Here the same architecture (our
``models.speaker_encoder`` GE2E LSTM) runs in JAX; pretrained weights can be
loaded from an .npz exported from torch (keys lstm.weight_ih_l{k},
lstm.weight_hh_l{k}, lstm.bias_ih_l{k}, lstm.bias_hh_l{k}, linear.weight,
linear.bias).  Without weights it still yields a deterministic random-init
encoder — useful for pipeline tests, not for absolute EER parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.speaker_encoder import (ge2e_embed, GE2E_MEL_CHANNELS,
                                      GE2E_HIDDEN, GE2E_LAYERS)
from ..models import nn
from ..preprocess.refmel import (preprocess_ref_wav, wav_to_mel40,
                                 compute_partial_slices, tile_to_min_length,
                                 PARTIALS_N_FRAMES)


class DVectorEncoder:
    def __init__(self, weights_npz=None, seed=0, require_weights=False):
        """``calibrated`` is True only when pretrained GE2E weights loaded.

        Random-init d-vectors keep the pipeline runnable but make absolute
        EER meaningless; every consumer must surface that (the harness tags
        report rows UNCALIBRATED). ``require_weights=True`` refuses instead.
        """
        if weights_npz and os.path.exists(weights_npz):
            self.params = self._from_npz(weights_npz)
            self.calibrated = True
        else:
            if require_weights:
                raise FileNotFoundError(
                    f"GE2E weights npz not found at {weights_npz!r}; "
                    "refusing to produce uncalibrated d-vectors "
                    "(pass require_weights=False for pipeline tests)")
            import warnings
            warnings.warn(
                "DVectorEncoder running with RANDOM-INIT weights: EER / "
                "similarity numbers are UNCALIBRATED and not comparable to "
                "the reference (export resemblyzer weights to npz to fix)",
                stacklevel=2)
            self.calibrated = False
            rng = jax.random.PRNGKey(seed)
            k1, k2 = jax.random.split(rng)
            self.params = {
                "lstm": nn.lstm_init(k1, GE2E_MEL_CHANNELS, GE2E_HIDDEN,
                                     GE2E_LAYERS),
                "linear": nn.linear_init(k2, GE2E_HIDDEN, GE2E_HIDDEN),
            }
        self._embed = jax.jit(ge2e_embed)

    @staticmethod
    def _from_npz(path):
        w = np.load(path)
        layers = []
        for k in range(GE2E_LAYERS):
            layers.append({
                "w_ih": jnp.asarray(w[f"lstm.weight_ih_l{k}"].T),
                "w_hh": jnp.asarray(w[f"lstm.weight_hh_l{k}"].T),
                "b_ih": jnp.asarray(w[f"lstm.bias_ih_l{k}"]),
                "b_hh": jnp.asarray(w[f"lstm.bias_hh_l{k}"]),
            })
        return {"lstm": {"layers": layers},
                "linear": {"w": jnp.asarray(w["linear.weight"].T),
                           "b": jnp.asarray(w["linear.bias"])}}

    def embed_utterance(self, wav, sr):
        """wav -> (256,) L2-normalized utterance d-vector (mean of partials)."""
        wav = preprocess_ref_wav(np.asarray(wav, np.float32), sr)
        # short utterances are looped to fill one partial, not zero-padded
        # (zero tails collapse the final-hidden readout; see refmel
        # .tile_to_min_length).  Must match ge2e_scratch.utterance_partial
        # exactly — the scratch verifier is trained on this frontend.
        wav = tile_to_min_length(wav)
        wav_slices, mel_slices = compute_partial_slices(len(wav))
        if wav_slices[-1].stop >= len(wav):
            wav = np.pad(wav, (0, wav_slices[-1].stop - len(wav)))
        mel = wav_to_mel40(wav)
        parts = np.stack([mel[s] for s in mel_slices]) if mel_slices else \
            np.zeros((1, PARTIALS_N_FRAMES, GE2E_MEL_CHANNELS), np.float32)
        embeds = np.asarray(self._embed(self.params, jnp.asarray(parts)))
        mean = embeds.mean(axis=0)
        return mean / max(np.linalg.norm(mean), 1e-8)
