import numpy as np
import pytest

from metatts_tpu.ops.pallas.melspec import fused_mel_spectrogram
from metatts_tpu.ops.stft import TacotronSTFT


def test_fused_melspec_matches_xla_reference():
    rng = np.random.RandomState(0)
    y = rng.uniform(-0.8, 0.8, (2, 22050)).astype(np.float32)
    mel_p, en_p = fused_mel_spectrogram(y, interpret=True)
    stft = TacotronSTFT()
    mel_r, en_r = stft.mel_spectrogram(y)
    np.testing.assert_allclose(np.asarray(mel_p), np.asarray(mel_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(en_p), np.asarray(en_r),
                               rtol=1e-4, atol=1e-4)


def test_fused_melspec_short_input():
    # shorter than one frame block -> single padded block
    y = np.zeros((1, 1000), np.float32)
    mel, en = fused_mel_spectrogram(y, interpret=True)
    assert mel.shape == (1, 80, 1000 // 256 + 1)
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), atol=1e-5)
