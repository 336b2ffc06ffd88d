"""JAX-native MBNet mean net vs a torch build of the official layout.

The reference scores audio with ``Pytorch_MBNet.model.MBNet(num_judges=
5000).only_mean_inference`` over the pretrained ``model-50000.pt``
(reference ``evaluation/compute_mos.py:144-166``).  Real weights are
environment-blocked, so this test (a) builds the mean subnet in torch with
the official state-dict layout (``mean_net_conv.<i>``/``mean_net_rnn``/
``mean_net_dnn.<i>`` plus bias-net keys the converter must ignore),
(b) converts with ``tools/convert_torch_weights.py convert_mbnet_pt``, and
(c) asserts the JAX forward matches torch — so the real checkpoint is a
file drop."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

torch = pytest.importorskip("torch")


class _TorchMBNet(torch.nn.Module):
    """Official Pytorch_MBNet layout: mean subnet (MOSNet CNN-BLSTM
    structure per the MBNet paper) + representative bias-net/judge keys
    so the converter proves it exports ONLY the mean net."""

    def __init__(self, num_judges=50):
        super().__init__()
        nn = torch.nn
        layers = []
        in_ch = 1
        for ch in (16, 32, 64, 128):
            for stride in ((1, 1), (1, 1), (1, 3)):
                layers += [nn.Conv2d(in_ch, ch, 3, stride=stride, padding=1),
                           nn.ReLU()]
                in_ch = ch
        self.mean_net_conv = nn.Sequential(*layers)
        self.mean_net_rnn = nn.LSTM(input_size=512, hidden_size=128,
                                    batch_first=True, bidirectional=True)
        self.mean_net_dnn = nn.Sequential(
            nn.Linear(256, 128), nn.ReLU(), nn.Dropout(0.3),
            nn.Linear(128, 1))
        # bias net members — present in the checkpoint, unused by
        # only_mean_inference, must NOT leak into the npz
        self.judge_embedding = nn.Embedding(num_judges, 86)
        self.bias_net_conv = nn.Sequential(
            nn.Conv2d(1, 16, 3, padding=1), nn.ReLU())
        self.bias_net_linear = nn.Linear(128, 1)

    def only_mean_inference(self, spectrum):
        """spectrum: (B, 1, T, 257) — reference compute_mos.py:161-164."""
        B, T = spectrum.shape[0], spectrum.shape[2]
        x = self.mean_net_conv(spectrum)          # (B, 128, T, 4) NCHW
        x = x.permute(0, 2, 3, 1).reshape(B, T, 512)
        x, _ = self.mean_net_rnn(x)
        x = self.mean_net_dnn(x)                  # (B, T, 1)
        return x.squeeze(-1).mean(dim=-1)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(7)
    model = _TorchMBNet().eval()
    d = tmp_path_factory.mktemp("mbnet")
    pt, npz = str(d / "model-50000.pt"), str(d / "mbnet.npz")
    torch.save(model.state_dict(), pt)
    from convert_torch_weights import convert_mbnet_pt
    convert_mbnet_pt(pt, npz)
    return model, npz


def test_converter_exports_only_mean_net(converted):
    _, npz = converted
    z = np.load(npz)
    assert len(z.files) == 12 * 2 + 6 + 4
    assert not any("judge" in k or "bias_net" in k for k in z.files)
    assert z["conv11.kernel"].shape == (3, 3, 128, 128)
    assert z["blstm.fwd.kernel"].shape == (512, 512)
    assert z["dense1.kernel"].shape == (256, 128)
    assert z["frame.kernel"].shape == (128, 1)


def test_jax_forward_matches_torch(converted):
    model, npz = converted
    from metatts_tpu.evaluation.mbnet import load_params, forward

    rng = np.random.default_rng(3)
    mag = rng.random((2, 33, 257), np.float32) * 4.0
    with torch.no_grad():
        want = model.only_mean_inference(
            torch.tensor(mag).unsqueeze(1)).numpy()

    got, frames = forward(load_params(npz), mag)
    assert frames.shape == (2, 33)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_scorer_registration_and_feature(converted):
    _, npz = converted
    from metatts_tpu.evaluation import mos
    from metatts_tpu.evaluation.mbnet import magnitude_spectrogram

    assert mos.try_register_mbnet_native(npz)
    assert "mbnet" in mos.available_scorers()

    sr = 16000
    t = np.arange(sr // 4) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    # feature contract: librosa-default hop 128, centered -> 1 + len//128
    mag = magnitude_spectrogram(wav, sr)
    assert mag.shape == (1 + len(wav) // 128, 257)
    # resample path exercised via a non-16k rate
    s = mos.score("mbnet", wav, 22050)
    assert np.isfinite(s)
