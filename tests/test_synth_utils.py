import numpy as np

from metatts_tpu.train.synth_utils import (expand_by_duration, denormalize,
                                           plot_mel_with_tracks)


def test_expand_by_duration():
    out = expand_by_duration([1.0, 2.0, 3.0], [2, 0, 3])
    np.testing.assert_array_equal(out, [1.0, 1.0, 3.0, 3.0, 3.0])


def test_denormalize():
    np.testing.assert_allclose(denormalize([0.0, 1.0], 5.0, 2.0),
                               [5.0, 7.0])


def test_plot_mel_with_tracks(tmp_path):
    mel = np.random.RandomState(0).randn(20, 8)
    pitch = np.linspace(100, 200, 20)
    energy = np.linspace(0, 1, 20)
    p = plot_mel_with_tracks(mel, pitch, energy,
                             str(tmp_path / "fig.png"))
    import os
    assert os.path.getsize(p) > 1000
