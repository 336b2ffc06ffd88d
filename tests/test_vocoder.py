import numpy as np
import jax
import pytest

from metatts_tpu.models.vocoder import (melgan_init, melgan_apply,
                                        hifigan_init, hifigan_apply, Vocoder)


def test_melgan_shapes():
    params = melgan_init(jax.random.PRNGKey(0))
    mel = np.random.RandomState(0).randn(1, 23, 80).astype(np.float32)
    wav = np.asarray(melgan_apply(params, mel))
    assert wav.shape == (1, 23 * 256)
    assert np.abs(wav).max() <= 1.0


def test_hifigan_shapes():
    params = hifigan_init(jax.random.PRNGKey(0))
    mel = np.random.RandomState(0).randn(1, 17, 80).astype(np.float32)
    wav = np.asarray(hifigan_apply(params, mel))
    assert wav.shape == (1, 17 * 256)
    assert np.abs(wav).max() <= 1.0


def test_vocoder_wrapper_int16():
    v = Vocoder({"vocoder": {"model": "MelGAN"}})
    mel = np.random.RandomState(1).randn(2, 11, 80).astype(np.float32)
    wavs = v.infer(mel, lengths=[2816, 1000])
    assert wavs[0].dtype == np.int16
    assert len(wavs[0]) == 2816 and len(wavs[1]) == 1000


def test_unknown_vocoder():
    with pytest.raises(ValueError):
        Vocoder({"vocoder": {"model": "WaveNet"}})
