"""JAX-native MOSNet (CNN-BLSTM) pseudo-MOS scorer.

The reference scores synthesized audio with MOSNet through the
``speechmetrics`` package (reference ``evaluation/compute_mos.py:25``),
which loads the official Keras checkpoint ``cnn_blstm.h5`` (MOSNet, Lo et
al. 2019).  This module is a functional JAX re-implementation of that exact
architecture so the official weights become a file drop:

    tools/convert_torch_weights.py convert_mosnet_h5 cnn_blstm.h5 mosnet.npz
    evaluate.py --mos --mosnet-weights mosnet.npz

Architecture (validated output-equivalent to a Keras build of the same
graph in tests/test_mosnet.py):

  input  (B, T, 257) magnitude STFT (sr 16 kHz, n_fft 512, hop 256, hann)
  -> reshape (B, T, 257, 1)
  -> 4 conv blocks, channels [16, 32, 64, 128]; each block is three
     Conv2D(3x3, relu, 'same'), strides (1,1), (1,1), (1,3)
  -> (B, T, 4, 128) -> reshape (B, T, 512)
  -> Bidirectional LSTM(128), concat -> (B, T, 256)
  -> TimeDistributed Dense(128, relu) -> Dense(1) frame scores
  -> utterance score = mean over frames
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

SR = 16000
N_FFT = 512
HOP = 256
CHANNELS = (16, 32, 64, 128)
LSTM_UNITS = 128


def magnitude_spectrogram(wav, sr):
    """|STFT| feature the official MOSNet computes (librosa defaults:
    centered, reflect-padded, hann window) -> (T, 257) float32."""
    from ..preprocess.audio_io import resample
    wav = np.asarray(wav, np.float32)
    if sr != SR:
        wav = resample(wav, sr, SR)
    pad = N_FFT // 2
    if len(wav) < 1:
        wav = np.zeros(1, np.float32)
    wav = np.pad(wav, pad, mode="reflect" if len(wav) > pad else "constant")
    n_frames = 1 + (len(wav) - N_FFT) // HOP
    if n_frames < 1:
        return np.zeros((1, N_FFT // 2 + 1), np.float32)
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = wav[idx] * np.hanning(N_FFT + 1)[:-1]
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


def load_params(npz_path):
    """Load converted MOSNet weights (tools/convert_torch_weights.py
    ``convert_mosnet_h5``) into the forward pytree."""
    z = np.load(npz_path)
    p = {"convs": [], "blstm": {}, "dense1": {}, "frame": {}}
    for i in range(12):
        p["convs"].append({"kernel": jnp.asarray(z[f"conv{i}.kernel"]),
                           "bias": jnp.asarray(z[f"conv{i}.bias"])})
    for d in ("fwd", "bwd"):
        p["blstm"][d] = {
            "kernel": jnp.asarray(z[f"blstm.{d}.kernel"]),
            "recurrent": jnp.asarray(z[f"blstm.{d}.recurrent"]),
            "bias": jnp.asarray(z[f"blstm.{d}.bias"]),
        }
    for name in ("dense1", "frame"):
        p[name] = {"kernel": jnp.asarray(z[f"{name}.kernel"]),
                   "bias": jnp.asarray(z[f"{name}.bias"])}
    return p


def _keras_lstm(p, x):
    """Keras-layout LSTM scan: kernel (D, 4H), recurrent (H, 4H), bias (4H,);
    gate order i, f, c(=g), o — identical semantics to the torch order used
    in models/nn.py."""
    H = p["recurrent"].shape[0]
    xw = jnp.einsum("btd,dg->btg", x, p["kernel"]) + p["bias"]

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, p["recurrent"])
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    B = x.shape[0]
    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = lax.scan(step, init, xw.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def forward(params, mag):
    """mag: (B, T, 257) magnitude spectrogram -> (avg (B,), frames (B, T))."""
    x = mag[..., None]                                  # (B, T, 257, 1)
    k = 0
    for _ in CHANNELS:
        for stride in ((1, 1), (1, 1), (1, 3)):
            c = params["convs"][k]
            x = lax.conv_general_dilated(
                x, c["kernel"], window_strides=stride, padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + c["bias"])
            k += 1
    B, T = x.shape[0], x.shape[1]
    x = x.reshape(B, T, -1)                             # (B, T, 4*128)
    fwd = _keras_lstm(params["blstm"]["fwd"], x)
    bwd = _keras_lstm(params["blstm"]["bwd"], x[:, ::-1])[:, ::-1]
    x = jnp.concatenate([fwd, bwd], axis=-1)            # (B, T, 256)
    x = jax.nn.relu(jnp.einsum("btd,dh->bth", x, params["dense1"]["kernel"])
                    + params["dense1"]["bias"])
    frames = (jnp.einsum("btd,dh->bth", x, params["frame"]["kernel"])
              + params["frame"]["bias"])[..., 0]        # (B, T)
    return frames.mean(axis=1), frames


class MOSNet:
    """Thin stateful wrapper: jitted forward over the converted weights."""

    def __init__(self, npz_path):
        self.params = load_params(npz_path)
        self._fwd = jax.jit(forward)

    def score(self, wav, sr):
        mag = magnitude_spectrogram(wav, sr)
        avg, _ = self._fwd(self.params, jnp.asarray(mag[None]))
        return float(avg[0])
