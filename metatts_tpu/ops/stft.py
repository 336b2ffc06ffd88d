"""STFT / mel-spectrogram / Griffin-Lim as XLA programs.

Numerically equivalent to the reference DSP stack (``audio/stft.py``,
``audio/audio_processing.py``) but TPU-native: the STFT is expressed as a
strided convolution against a windowed real-DFT basis, which XLA lowers onto
the MXU (the reference ran the same contraction as a CUDA conv1d,
``audio/stft.py:67-72``).  The mel filterbank reproduces librosa's
Slaney-normalized triangular filters (the reference calls
``librosa.filters.mel``, ``audio/stft.py:145-147``).

Everything here is jittable; ``TacotronSTFT.mel_spectrogram`` is the single
entry the preprocessor and tests use.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ------------------------------------------------------------------ mel fb

def _hz_to_mel(f):
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """(n_mels, n_fft//2+1) Slaney-normalized triangular mel filterbank.

    Matches librosa.filters.mel(htk=False, norm='slaney') to float64 accuracy.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_window(win_length, fftbins=True):
    """Periodic Hann (scipy.signal.get_window('hann', N, fftbins=True))."""
    n = np.arange(win_length)
    denom = win_length if fftbins else win_length - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)).astype(np.float64)


def dynamic_range_compression(x, C=1.0, clip_val=1e-5):
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C=1.0):
    return jnp.exp(x) / C


# ------------------------------------------------------------------ STFT

class TacotronSTFT:
    """STFT + mel projection with the reference's exact conventions.

    Holds precomputed constant operands (windowed DFT basis, mel basis,
    inverse basis) as numpy; methods are pure and jittable.
    """

    def __init__(self, filter_length=1024, hop_length=256, win_length=1024,
                 n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
                 mel_fmax=None):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.cutoff = filter_length // 2 + 1

        fourier = np.fft.fft(np.eye(filter_length))
        basis = np.vstack([np.real(fourier[: self.cutoff]),
                           np.imag(fourier[: self.cutoff])])

        window = _hann_window(win_length)
        if filter_length > win_length:  # center-pad window to filter_length
            lpad = (filter_length - win_length) // 2
            window = np.pad(window, (lpad, filter_length - win_length - lpad))

        self.forward_basis = (basis * window[None, :]).astype(np.float32)
        scale = filter_length / hop_length
        self.inverse_basis = (
            np.linalg.pinv(scale * basis).T * window[None, :]
        ).astype(np.float32)
        self.mel_basis = mel_filterbank(
            sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax)

        # window-sumsquare envelope is frame-count dependent; computed lazily
        self._win_sq = (window ** 2).astype(np.float32)

    # -- forward ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def transform(self, y):
        """(B, T) waveform in [-1, 1] -> magnitude, phase each (B, cutoff, frames)."""
        pad = self.filter_length // 2
        x = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        # Strided conv against the windowed DFT basis -> MXU.
        out = lax.conv_general_dilated(
            x[:, None, :],
            jnp.asarray(self.forward_basis)[:, None, :],
            window_strides=(self.hop_length,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        real = out[:, : self.cutoff]
        imag = out[:, self.cutoff :]
        magnitude = jnp.sqrt(real ** 2 + imag ** 2)
        phase = jnp.arctan2(imag, real)
        return magnitude, phase

    @functools.partial(jax.jit, static_argnums=0)
    def mel_spectrogram(self, y):
        """(B, T) wav -> (log-mel (B, n_mels, frames), energy (B, frames)).

        Reference: ``audio/stft.py:159-178`` — log-compressed Slaney mel and
        L2-over-frequency energy.
        """
        magnitudes, _ = self.transform(y)
        mel = jnp.einsum("mf,bft->bmt", jnp.asarray(self.mel_basis), magnitudes)
        mel = dynamic_range_compression(mel)
        energy = jnp.linalg.norm(magnitudes, axis=1)
        return mel, energy

    # -- inverse ---------------------------------------------------------

    def _window_sumsquare(self, n_frames):
        n = self.filter_length + self.hop_length * (n_frames - 1)
        x = np.zeros(n, dtype=np.float32)
        for i in range(n_frames):
            s = i * self.hop_length
            x[s : min(n, s + self.filter_length)] += self._win_sq[
                : max(0, min(self.filter_length, n - s))]
        return x

    def inverse(self, magnitude, phase):
        """ISTFT: overlap-add of inverse-basis frames (the reference's
        conv_transpose1d, ``audio/stft.py:84-122``) + window-sumsquare
        normalization.  Expressed as an lhs-dilated convolution with the
        spatially flipped kernel — the exact transpose of ``transform``."""
        n_frames = magnitude.shape[-1]
        rec = jnp.concatenate(
            [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=1)
        n = self.filter_length
        kernel = jnp.asarray(self.inverse_basis)[None, :, ::-1]  # (1, 2C, N)
        inv = lax.conv_general_dilated(
            rec,
            kernel,
            window_strides=(1,),
            padding=[(n - 1, n - 1)],
            lhs_dilation=(self.hop_length,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        wss = self._window_sumsquare(n_frames)
        tiny = np.finfo(np.float32).tiny
        denom = np.where(wss > tiny, wss, 1.0).astype(np.float32)
        inv = inv / jnp.asarray(denom)[None, None, :]
        inv = inv * (self.filter_length / self.hop_length)
        pad = self.filter_length // 2
        return inv[:, :, pad:-pad]

    def griffin_lim(self, magnitudes, n_iters=60, seed=0):
        """Phase recovery by alternating projection (reference:
        ``audio/audio_processing.py:66-82``)."""
        key = jax.random.PRNGKey(seed)
        angles = jax.random.uniform(
            key, magnitudes.shape, minval=-np.pi, maxval=np.pi)
        signal = self.inverse(magnitudes, angles)[:, 0]
        for _ in range(n_iters):
            _, angles = self.transform(signal)
            signal = self.inverse(magnitudes, angles)[:, 0]
        return signal
