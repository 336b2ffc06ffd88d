"""JAX-native MBNet mean-net pseudo-MOS scorer.

The reference scores synthesized audio with MBNet (reference
``evaluation/compute_mos.py:144-166``): it builds
``Pytorch_MBNet.model.MBNet(num_judges=5000)``, loads the pretrained
``model-50000.pt`` checkpoint, and calls ``only_mean_inference`` on the
16 kHz magnitude STFT (``n_fft=512``, librosa defaults -> hop 128).  Only
the MEAN subnet participates in that call (the bias subnet + judge
embedding exist for training against per-judge scores; see MBNet,
Leng et al. 2021).  Per the paper, the mean net adopts MOSNet's CNN-BLSTM
structure:

  input  (B, T, 257) magnitude STFT (sr 16 kHz, n_fft 512, hop 128, hann)
  -> (B, 1, T, 257) NCHW in torch
  -> 4 conv blocks, channels [16, 32, 64, 128]; each block is three
     Conv2d(3x3, relu, padding=1), the third with stride (1,3)
     (torch floor-mode shapes: 257 -> 86 -> 29 -> 10 -> 4 freq bins)
  -> permute/reshape to (B, T, 4*128)
  -> Bidirectional LSTM(128), concat -> (B, T, 256)
  -> Linear(256,128) + ReLU (+ dropout, inference no-op) -> Linear(128,1)
  -> utterance score = mean over frame scores

Weights become a file drop:

    tools/convert_torch_weights.py convert_mbnet_pt model-50000.pt mbnet.npz
    evaluate.py --mos --mbnet-weights mbnet.npz

The converter + this forward are cross-validated against a torch build of
the same state-dict layout in tests/test_mbnet.py.  One documented
assumption that cannot be verified offline: the NCHW->(B,T,512) flatten
order is taken to be freq-major within frame (``permute(0,2,3,1)`` then
reshape), matching MOSNet's Keras layout; if a real checkpoint scores
nonsensically, flip that permute first.

Note torch's ``padding=1, stride=(1,3)`` is NOT XLA "SAME" padding on a
257-wide axis (SAME would pad asymmetrically); the forward uses explicit
((1,1),(1,1)) padding to match torch exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .mosnet import _keras_lstm

SR = 16000
N_FFT = 512
HOP = 128          # librosa.stft default: win_length // 4
CHANNELS = (16, 32, 64, 128)
LSTM_UNITS = 128


def magnitude_spectrogram(wav, sr):
    """|STFT| feature of the reference's ``MBNetDataset.__getitem__``
    (librosa defaults: centered, reflect-padded, hann, hop 128)
    -> (T, 257) float32."""
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
    """Load converted MBNet mean-net weights
    (``tools/convert_torch_weights.py convert_mbnet_pt``)."""
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


def forward(params, mag):
    """mag: (B, T, 257) -> (utterance scores (B,), frame scores (B, T))."""
    x = mag[..., None]                                  # (B, T, 257, 1) NHWC
    k = 0
    for _ in CHANNELS:
        for stride in ((1, 1), (1, 1), (1, 3)):
            c = params["convs"][k]
            # torch Conv2d(padding=1): explicit symmetric padding, floor mode
            x = lax.conv_general_dilated(
                x, c["kernel"], window_strides=stride,
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + c["bias"])
            k += 1
    B, T = x.shape[0], x.shape[1]
    x = x.reshape(B, T, -1)                             # (B, T, 4*128) f-major
    fwd = _keras_lstm(params["blstm"]["fwd"], x)
    bwd = _keras_lstm(params["blstm"]["bwd"], x[:, ::-1])[:, ::-1]
    x = jnp.concatenate([fwd, bwd], axis=-1)            # (B, T, 256)
    x = jax.nn.relu(jnp.einsum("btd,dh->bth", x, params["dense1"]["kernel"])
                    + params["dense1"]["bias"])
    frames = (jnp.einsum("btd,dh->bth", x, params["frame"]["kernel"])
              + params["frame"]["bias"])[..., 0]        # (B, T)
    return frames.mean(axis=1), frames


class MBNetMean:
    """Jitted ``only_mean_inference`` over converted official weights."""

    def __init__(self, npz_path):
        self.params = load_params(npz_path)
        self._fwd = jax.jit(forward)

    def score(self, wav, sr):
        mag = magnitude_spectrogram(wav, sr)
        avg, _ = self._fwd(self.params, jnp.asarray(mag[None]))
        return float(avg[0])
