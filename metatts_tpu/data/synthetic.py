"""Deterministic synthetic multi-speaker corpus with learnable speaker
structure.

Purpose: demonstrate the framework's core scientific capability — that
meta-trained few-shot adaptation beats baseline multi-task training on
held-out speakers — without a real corpus or pretrained weights (the
environment has neither).  The reference establishes this with LibriTTS
speaker-verification EER (``/root/reference/evaluation/txt/LibriTTS/eer.txt``:
meta 0.1776 vs baseline 0.4309 at 10 adaptation steps); here the analogue is
query loss vs fine-tune step on speakers the training never saw.

Generative model (everything derives deterministically from one seed):

* a phone inventory with per-phone mel **prototypes**, base pitch, base
  energy and base durations — the speaker-independent structure both
  systems can learn outright;
* per-speaker latents — a mel **tilt** vector added to every frame, a pitch
  offset, an energy offset, and a duration rate multiplier — the structure
  that is *only* recoverable from a speaker's own utterances.  Held-out
  speakers draw their latents from the same distribution, so few-shot
  adaptation has something real to absorb and generalize to the query set.

Utterances are emitted directly as :class:`~metatts_tpu.models.fastspeech2.
Batch` pytrees (static shapes: L phones, T mel frames), the same contract
the real data pipeline produces, so ``System.train_step`` /
``System.test_adapt`` run unchanged on them.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..models.fastspeech2 import Batch

# stats matching the latent distributions below (pitch/energy z-scores land
# in roughly [-4, 4]); feeds the variance-adaptor bucketing bins
STATS = {"pitch": [-5.0, 5.0, 0.0, 1.0], "energy": [-5.0, 5.0, 0.0, 1.0]}


class SyntheticVoices:
    """A frozen universe of speakers + a deterministic utterance sampler.

    Parameters
    ----------
    n_speakers : total speakers; callers split the id range into train /
        held-out sets (latents are iid, so any split is exchangeable).
    vocab : phone inventory size (ids 1..vocab map into the real 361-symbol
        text table; 0 stays the pad symbol).
    L, T : static phone / mel-frame lengths (every utterance is exactly L
        phones; durations are constructed to sum to <= T).
    noise : per-utterance observation noise on mel/pitch/energy — keeps the
        support and query sets of an episode from being identical, so
        adaptation must generalize rather than memorize.
    """

    def __init__(self, n_speakers, n_mels=8, vocab=40, L=16, T=48, seed=0,
                 noise=0.05, tilt_spread=0.8, pitch_spread=1.2,
                 energy_spread=0.8, dur_spread=0.3):
        rng = np.random.RandomState(seed)
        self.n_speakers = n_speakers
        self.n_mels = n_mels
        self.vocab = vocab
        self.L = L
        self.T = T
        self.noise = noise
        # speaker-independent phone structure
        self.proto = rng.randn(vocab + 1, n_mels).astype(np.float32)
        self.base_p = (rng.randn(vocab + 1) * 0.7).astype(np.float32)
        self.base_e = (rng.randn(vocab + 1) * 0.7).astype(np.float32)
        self.base_d = rng.randint(1, 3, size=vocab + 1)  # 1..2 frames
        # per-speaker latents (the few-shot target)
        self.tilt = (rng.randn(n_speakers, n_mels)
                     * tilt_spread).astype(np.float32)
        self.pitch_off = (rng.randn(n_speakers)
                          * pitch_spread).astype(np.float32)
        self.energy_off = (rng.randn(n_speakers)
                           * energy_spread).astype(np.float32)
        self.dur_rate = (1.0 + rng.uniform(
            -dur_spread, dur_spread, n_speakers)).astype(np.float32)

    # ------------------------------------------------------------ sampling

    def utterance(self, speaker, rng):
        """One utterance of ``speaker`` as numpy arrays (no batch axis)."""
        phones = rng.randint(1, self.vocab + 1,
                             size=self.L).astype(np.int32)
        d = np.maximum(1, np.round(
            self.base_d[phones] * self.dur_rate[speaker])).astype(np.int32)
        # static-shape guarantee: base_d <= 2, rate <= 1.3 -> d <= 3;
        # trim from the end if L * 3 ever exceeded T
        while d.sum() > self.T:
            d[np.argmax(d)] -= 1
        total = int(d.sum())
        expanded = np.repeat(phones, d)
        mel = np.zeros((self.T, self.n_mels), np.float32)
        mel[:total] = (self.proto[expanded] + self.tilt[speaker]
                       + rng.randn(total, self.n_mels).astype(np.float32)
                       * self.noise)
        pitch = (self.base_p[phones] + self.pitch_off[speaker]
                 + rng.randn(self.L).astype(np.float32) * self.noise)
        energy = (self.base_e[phones] + self.energy_off[speaker]
                  + rng.randn(self.L).astype(np.float32) * self.noise)
        return dict(phones=phones, d=d, mel=mel, mel_len=total,
                    pitch=pitch.astype(np.float32),
                    energy=energy.astype(np.float32))

    def batch(self, speakers, rng):
        """Flat supervised Batch — one utterance per entry of ``speakers``."""
        utts = [self.utterance(s, rng) for s in speakers]
        return Batch(
            speaker_args=jnp.asarray(np.asarray(speakers, np.int32)),
            texts=jnp.asarray(np.stack([u["phones"] for u in utts])),
            src_lens=jnp.full((len(utts),), self.L, jnp.int32),
            mels=jnp.asarray(np.stack([u["mel"] for u in utts])),
            mel_lens=jnp.asarray(np.asarray(
                [u["mel_len"] for u in utts], np.int32)),
            p_targets=jnp.asarray(np.stack([u["pitch"] for u in utts])),
            e_targets=jnp.asarray(np.stack([u["energy"] for u in utts])),
            d_targets=jnp.asarray(np.stack([u["d"] for u in utts])),
        )

    def episode(self, speaker, shots, queries, rng):
        """(support, query) Batches of one speaker — a 1-way few-shot task."""
        sup = self.batch([speaker] * shots, rng)
        qry = self.batch([speaker] * queries, rng)
        return sup, qry

    def meta_batch(self, speakers, shots, queries, rng):
        """Episode-stacked (sup, qry) with leading axis E = len(speakers)."""
        eps = [self.episode(s, shots, queries, rng) for s in speakers]
        sup = jax.tree.map(lambda *xs: jnp.stack(xs), *[e[0] for e in eps])
        qry = jax.tree.map(lambda *xs: jnp.stack(xs), *[e[1] for e in eps])
        return sup, qry


class SyntheticMelVocoder:
    """Griffin-Lim pseudo-vocoder for the synthetic corpus.

    Treats the n_mels-channel synthetic features as log-compressed mel
    magnitudes (the convention of the real pipeline,
    ``ops/stft.py dynamic_range_compression``), lifts them to a
    linear-frequency magnitude spectrogram through the mel filterbank's
    pseudo-inverse and recovers phase with Griffin-Lim
    (``ops/stft.py:196``) — no pretrained vocoder weights needed.  The
    per-speaker mel tilt (a per-channel offset in log space) becomes a
    multiplicative spectral envelope in the audio, so speaker identity
    survives the wav -> 40-mel -> d-vector round trip; that is what makes
    the EER-space meta-advantage experiment (``tools/exp_meta_eer.py``)
    possible end to end on synthesized AUDIO, like the reference's
    ``evaluation/txt/*/eer.txt`` tables.
    """

    def __init__(self, n_mels=8, sr=16000, n_fft=1024, hop=512,
                 n_iters=24, seed=0):
        # defaults give T=48-frame synthetic utterances a ~1.5 s duration —
        # comfortably one 160-frame (1.6 s) GE2E partial after the 16 kHz
        # resemblyzer frontend, so d-vectors see the whole utterance
        from ..ops.stft import TacotronSTFT
        self.sr = sr
        self.hop = hop
        self.n_iters = n_iters
        self.stft = TacotronSTFT(
            filter_length=n_fft, hop_length=hop, win_length=n_fft,
            n_mel_channels=n_mels, sampling_rate=sr, mel_fmin=0.0,
            mel_fmax=sr / 2.0)
        # (n_bins, n_mels) non-negative lift of the Slaney filterbank
        self._inv = np.maximum(np.linalg.pinv(self.stft.mel_basis), 0.0)
        self._gl = jax.jit(
            lambda mags: self.stft.griffin_lim(mags, n_iters=n_iters,
                                               seed=seed))

    def __call__(self, mels, mel_lens=None):
        """(B, T, n_mels) log-mel features -> list of B float32 wavs
        (peak-normalized); ``mel_lens`` trims each wav to its frame count.
        """
        mels = np.asarray(mels, np.float32)
        mag_mel = np.exp(np.clip(mels, -10.0, 6.0))       # (B, T, n_mels)
        mags = np.einsum("fm,btm->bft", self._inv, mag_mel)
        wavs = np.asarray(self._gl(jnp.asarray(mags)))
        out = []
        for b in range(wavs.shape[0]):
            w = wavs[b]
            if mel_lens is not None:
                w = w[: int(mel_lens[b]) * self.hop]
            peak = np.abs(w).max()
            out.append((0.9 * w / peak if peak > 1e-8 else w).astype(
                np.float32))
        return out
