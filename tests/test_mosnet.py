"""JAX-native MOSNet vs a Keras build of the official CNN-BLSTM.

The reference scores audio with MOSNet via speechmetrics, which loads the
official Keras checkpoint ``cnn_blstm.h5`` (reference
``evaluation/compute_mos.py:25``).  Real weights are environment-blocked, so
this test (a) builds the SAME architecture in Keras as the math ground
truth, (b) writes its weights into the legacy-h5 layout the official file
uses (``layer_names``/``weight_names`` attrs), (c) converts with
``tools/convert_torch_weights.py convert_mosnet_h5``, and (d) asserts the
JAX forward matches the Keras forward — so the real checkpoint is a file
drop."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

tf = pytest.importorskip("tensorflow")


def _keras_mosnet():
    """The official MOSNet CNN-BLSTM graph (MOSNet repo model.py)."""
    from tensorflow import keras
    from tensorflow.keras import layers

    inp = keras.Input(shape=(None, 257))
    x = layers.Reshape((-1, 257, 1))(inp)
    for ch in (16, 32, 64, 128):
        for stride in ((1, 1), (1, 1), (1, 3)):
            x = layers.Conv2D(ch, (3, 3), strides=stride, padding="same",
                              activation="relu")(x)
    x = layers.Reshape((-1, 4 * 128))(x)
    x = layers.Bidirectional(
        layers.LSTM(128, return_sequences=True), merge_mode="concat")(x)
    x = layers.TimeDistributed(layers.Dense(128, activation="relu"))(x)
    frame = layers.TimeDistributed(layers.Dense(1), name="frame")(x)
    avg = layers.GlobalAveragePooling1D(name="avg")(frame)
    return keras.Model(inputs=inp, outputs=[avg, frame])


def _write_legacy_h5(model, path):
    """Write weights in the legacy Keras-h5 layout of the official
    ``cnn_blstm.h5`` (top-level ``layer_names`` attr; per-layer
    ``weight_names``; TF1-era name suffixes)."""
    import h5py

    with h5py.File(path, "w") as f:
        layer_names = []
        conv_i = 0
        dense_i = 0
        for layer in model.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            cls = type(layer).__name__
            if cls == "Conv2D":
                lname = f"conv2d_{conv_i}" if conv_i else "conv2d"
                wnames = [f"{lname}/kernel:0", f"{lname}/bias:0"]
                conv_i += 1
            elif cls == "Bidirectional":
                lname = "bidirectional"
                wnames = [
                    "bidirectional/forward_lstm/lstm_cell/kernel:0",
                    "bidirectional/forward_lstm/lstm_cell/recurrent_kernel:0",
                    "bidirectional/forward_lstm/lstm_cell/bias:0",
                    "bidirectional/backward_lstm/lstm_cell/kernel:0",
                    "bidirectional/backward_lstm/lstm_cell/recurrent_kernel:0",
                    "bidirectional/backward_lstm/lstm_cell/bias:0",
                ]
            else:                                   # TimeDistributed Dense
                lname = "time_distributed" if dense_i == 0 else "frame"
                wnames = [f"{lname}/dense_{dense_i}/kernel:0",
                          f"{lname}/dense_{dense_i}/bias:0"]
                dense_i += 1
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames])
            for w, a in zip(wnames, ws):
                g.create_dataset(w, data=a)
            layer_names.append(lname.encode())
        f.attrs["layer_names"] = np.array(layer_names)


def test_mosnet_jax_matches_keras(tmp_path):
    from convert_torch_weights import convert_mosnet_h5
    from metatts_tpu.evaluation import mosnet

    tf.random.set_seed(3)
    model = _keras_mosnet()
    h5 = str(tmp_path / "cnn_blstm.h5")
    npz = str(tmp_path / "mosnet.npz")
    _write_legacy_h5(model, h5)
    convert_mosnet_h5(h5, npz)

    rng = np.random.RandomState(0)
    mag = rng.rand(2, 37, 257).astype(np.float32) * 3.0
    k_avg, k_frames = model.predict(mag, verbose=0)

    params = mosnet.load_params(npz)
    j_avg, j_frames = mosnet.forward(params, mag)
    np.testing.assert_allclose(np.asarray(j_frames), k_frames[..., 0],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_avg), k_avg[:, 0], atol=2e-4)


def test_mosnet_scorer_end_to_end(tmp_path):
    """Spectrogram frontend + MOSNet wrapper + registry wiring on a synthetic
    wav (random-init weights: checks plumbing + shapes, not calibration)."""
    from convert_torch_weights import convert_mosnet_h5
    from metatts_tpu.evaluation import mos
    from metatts_tpu.evaluation.mosnet import (MOSNet,
                                               magnitude_spectrogram)

    model = _keras_mosnet()
    h5 = str(tmp_path / "w.h5")
    npz = str(tmp_path / "w.npz")
    _write_legacy_h5(model, h5)
    convert_mosnet_h5(h5, npz)

    t = np.arange(16000) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    mag = magnitude_spectrogram(wav, 16000)
    assert mag.shape[1] == 257 and mag.shape[0] > 50
    assert np.isfinite(mag).all()

    # 22.05 kHz input exercises the resample path
    s = MOSNet(npz).score(wav, 22050)
    assert np.isfinite(s)

    assert mos.try_register_mosnet_native(npz)
    assert "mosnet" in mos.available_scorers()
    assert np.isfinite(mos.score("mosnet", wav, 16000))
    mos._SCORERS.pop("mosnet", None)   # don't leak into other tests
    assert not mos.try_register_mosnet_native(str(tmp_path / "missing.npz"))
