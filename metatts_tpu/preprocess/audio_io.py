"""Wav IO + resampling (replaces librosa.load / scipy write in the reference).

All offline-CPU numpy; no torch/librosa.
"""

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly
from math import gcd


def load_wav(path, target_sr=None):
    """Read a wav -> (float32 in [-1, 1], sr), resampling if asked."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if target_sr is not None and sr != target_sr:
        x = resample(x, sr, target_sr)
        sr = target_sr
    return x, sr


def resample(x, sr, target_sr):
    g = gcd(int(sr), int(target_sr))
    return resample_poly(x, target_sr // g, sr // g).astype(np.float32)


def save_wav(path, x, sr, max_wav_value=32768.0):
    """float [-1,1] -> int16 wav (reference convention, utils/model.py:48)."""
    x = np.asarray(x)
    if x.dtype.kind == "f":
        x = np.clip(x, -1.0, 1.0)
        x = (x * (max_wav_value - 1)).astype(np.int16)
    wavfile.write(path, sr, x)
