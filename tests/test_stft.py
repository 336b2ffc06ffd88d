import numpy as np
import pytest

from metatts_tpu.ops.stft import TacotronSTFT, mel_filterbank, _hann_window


@pytest.fixture(scope="module")
def stft():
    return TacotronSTFT(1024, 256, 1024, 80, 22050, 0.0, None)


def _numpy_stft_mag(y, n_fft, hop):
    """Independent reference: reflect pad + frame + hann + rfft magnitude."""
    pad = n_fft // 2
    x = np.pad(y, (pad, pad), mode="reflect")
    win = _hann_window(n_fft)
    n_frames = (len(x) - n_fft) // hop + 1
    frames = np.stack([x[i * hop : i * hop + n_fft] * win for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames, axis=-1)).T  # (freq, frames)


def test_transform_matches_numpy_rfft(stft):
    rng = np.random.RandomState(0)
    y = rng.uniform(-0.9, 0.9, size=(1, 22050)).astype(np.float32)
    mag, _ = stft.transform(y)
    ref = _numpy_stft_mag(y[0].astype(np.float64), 1024, 256)
    assert mag.shape == (1, 513, ref.shape[1])
    np.testing.assert_allclose(np.asarray(mag[0]), ref, rtol=1e-3, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # Every filter is nonzero and unimodal (triangular)
    assert np.all(fb.max(axis=1) > 0)
    # Slaney normalization: filters integrate to ~2/bandwidth -> peak < 0.1
    assert fb.max() < 0.1
    # Filters should tile the spectrum: every bin above bin 2 covered
    assert np.all(fb[:, 3:-1].sum(axis=0) > 0)


def test_mel_spectrogram_shapes_and_energy(stft):
    rng = np.random.RandomState(1)
    y = rng.uniform(-0.5, 0.5, size=(2, 4096)).astype(np.float32)
    mel, energy = stft.mel_spectrogram(y)
    n_frames = 4096 // 256 + 1
    assert mel.shape == (2, 80, n_frames)
    assert energy.shape == (2, n_frames)
    # log compression: silence clamps to log(1e-5)
    sil_mel, sil_energy = stft.mel_spectrogram(np.zeros((1, 4096), np.float32))
    np.testing.assert_allclose(np.asarray(sil_mel), np.log(1e-5), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sil_energy), 0.0, atol=1e-4)


def test_istft_roundtrip(stft):
    # inverse(transform(y)) ~= y away from the edges
    t = np.arange(8192) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag, phase = stft.transform(y)
    rec = np.asarray(stft.inverse(mag, phase))[0, 0]
    n = min(len(rec), y.shape[1])
    err = np.abs(rec[512 : n - 512] - y[0, 512 : n - 512]).max()
    assert err < 1e-3


def test_griffin_lim_runs(stft):
    t = np.arange(4096) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    mag, _ = stft.transform(y)
    out = np.asarray(stft.griffin_lim(mag, n_iters=5))
    assert out.shape[0] == 1 and out.shape[1] > 3000
    assert np.isfinite(out).all()
