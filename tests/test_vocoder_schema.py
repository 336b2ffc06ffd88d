"""Pretrained-vocoder converter schema tests.

Fabricate state dicts with the OFFICIAL key names and shapes — the
descriptinc melgan-neurips Generator (torch.hub layout the reference loads
at ``lightning/utils.py:10-13``) and the jik876 HiFi-GAN v1 generator
(``utils/model.py:17-27``) — round-trip them through
``tools/convert_torch_weights.py``'s weight-norm folding and the
``models/vocoder.py`` npz loaders, and check output parity against torch
executing the same weights.  Day-1 with real released checkpoints is then a
file drop.

The torch modules below are compact test oracles restating the public
architectures (descriptinc/melgan-neurips mel2wav/modules.py, jik876/hifi-gan
models.py); they exist only to execute fabricated weights.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from metatts_tpu.models.vocoder import (  # noqa: E402
    melgan_apply, melgan_params_from_npz,
    hifigan_apply, hifigan_params_from_npz, Vocoder)


def _torch_melgan(n_mels=80, ngf=32, n_res=3, ratios=(8, 8, 2, 2)):
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    def wn_conv(*a, **k):
        return weight_norm(tnn.Conv1d(*a, **k))

    class Res(tnn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(dilation),
                wn_conv(dim, dim, 3, dilation=dilation),
                tnn.LeakyReLU(0.2), wn_conv(dim, dim, 1))
            self.shortcut = wn_conv(dim, dim, 1)

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = int(2 ** len(ratios))
    model = [tnn.ReflectionPad1d(3), wn_conv(n_mels, mult * ngf, 7)]
    for r in ratios:
        model += [tnn.LeakyReLU(0.2),
                  weight_norm(tnn.ConvTranspose1d(
                      mult * ngf, mult * ngf // 2, r * 2, stride=r,
                      padding=r // 2 + r % 2, output_padding=r % 2))]
        model += [Res(mult * ngf // 2, 3 ** j) for j in range(n_res)]
        mult //= 2
    model += [tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(3),
              wn_conv(ngf, 1, 7), tnn.Tanh()]

    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return G()


def _torch_hifigan(n_mels=80, ch=512, rates=(8, 8, 2, 2),
                   kernels=(16, 16, 4, 4), rks=(3, 7, 11),
                   rds=((1, 3, 5),) * 3):
    import torch.nn as tnn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    def pad(k, d=1):
        return (k * d - d) // 2

    class ResBlock1(tnn.Module):
        def __init__(self, c, k, ds):
            super().__init__()
            self.convs1 = tnn.ModuleList([
                weight_norm(tnn.Conv1d(c, c, k, dilation=d,
                                       padding=pad(k, d))) for d in ds])
            self.convs2 = tnn.ModuleList([
                weight_norm(tnn.Conv1d(c, c, k, padding=pad(k)))
                for _ in ds])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = F.leaky_relu(x, 0.1)
                xt = c1(xt)
                xt = F.leaky_relu(xt, 0.1)
                xt = c2(xt)
                x = xt + x
            return x

    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = weight_norm(tnn.Conv1d(n_mels, ch, 7, padding=3))
            self.ups = tnn.ModuleList()
            self.resblocks = tnn.ModuleList()
            c = ch
            for r, k in zip(rates, kernels):
                self.ups.append(weight_norm(tnn.ConvTranspose1d(
                    c, c // 2, k, stride=r, padding=(k - r) // 2)))
                c //= 2
                for rk, rd in zip(rks, rds):
                    self.resblocks.append(ResBlock1(c, rk, rd))
            self.conv_post = weight_norm(tnn.Conv1d(c, 1, 7, padding=3))

        def forward(self, x):
            x = self.conv_pre(x)
            for i, up in enumerate(self.ups):
                x = F.leaky_relu(x, 0.1)
                x = up(x)
                xs = None
                for j in range(len(rks)):
                    h = self.resblocks[i * len(rks) + j](x)
                    xs = h if xs is None else xs + h
                x = xs / len(rks)
            x = F.leaky_relu(x)            # official default slope 0.01
            x = torch.tanh(self.conv_post(x))
            return x

    return G()


def test_melgan_official_schema_roundtrip(tmp_path):
    from convert_torch_weights import convert_melgan

    torch.manual_seed(0)
    g = _torch_melgan().eval()
    sd = g.state_dict()
    # official layout sanity: weight-norm keys + descriptinc shapes
    assert sd["model.1.weight_v"].shape == (512, 80, 7)
    assert sd["model.3.weight_v"].shape == (512, 256, 16)   # ConvT IOH
    assert "model.4.block.2.weight_v" in sd and "model.4.shortcut.bias" in sd
    assert sd["model.24.weight_v"].shape == (1, 32, 7)

    src, dst = str(tmp_path / "melgan.pt"), str(tmp_path / "melgan.npz")
    torch.save(sd, src)
    convert_melgan(src, dst)
    params = melgan_params_from_npz(np.load(dst))

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 23, 80).astype(np.float32) * 0.5
    ours = np.asarray(melgan_apply(params, mel))
    with torch.no_grad():
        # melgan_apply folds the reference ln10 convention in; feed the
        # torch oracle the already-divided mel
        theirs = g(torch.tensor((mel / np.log(10.0)).astype(np.float32))
                   .transpose(1, 2))
    theirs = theirs.numpy()[:, 0]
    assert ours.shape == theirs.shape == (1, 23 * 256)
    assert np.abs(ours - theirs).max() < 1e-4


def test_hifigan_official_schema_roundtrip(tmp_path):
    from convert_torch_weights import convert_hifigan

    torch.manual_seed(1)
    g = _torch_hifigan().eval()
    sd = g.state_dict()
    assert sd["conv_pre.weight_v"].shape == (512, 80, 7)
    assert sd["ups.0.weight_v"].shape == (512, 256, 16)
    assert sd["resblocks.0.convs1.0.weight_v"].shape == (256, 256, 3)
    assert sd["resblocks.11.convs2.2.weight_v"].shape == (32, 32, 11)

    src, dst = str(tmp_path / "hifigan.pt"), str(tmp_path / "hifigan.npz")
    torch.save(sd, src)
    convert_hifigan(src, dst)
    params = hifigan_params_from_npz(np.load(dst))

    rng = np.random.RandomState(1)
    mel = rng.randn(1, 17, 80).astype(np.float32) * 0.5
    ours = np.asarray(hifigan_apply(params, mel))
    with torch.no_grad():
        theirs = g(torch.tensor(mel).transpose(1, 2)).numpy()[:, 0]
    assert ours.shape == theirs.shape == (1, 17 * 256)
    assert np.abs(ours - theirs).max() < 1e-4


def test_ge2e_official_schema_roundtrip(tmp_path):
    """resemblyzer VoiceEncoder layout: lstm.{weight,bias}_{ih,hh}_l{0..2}
    (LSTM 40->256 x3) + linear.{weight,bias} (256x256)."""
    from convert_torch_weights import convert_ge2e
    from metatts_tpu.evaluation.dvector import DVectorEncoder

    lstm = torch.nn.LSTM(40, 256, 3, batch_first=True)
    lin = torch.nn.Linear(256, 256)
    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"linear.{k}": v for k, v in lin.state_dict().items()})
    assert sd["lstm.weight_ih_l0"].shape == (1024, 40)
    assert sd["lstm.weight_hh_l2"].shape == (1024, 256)

    src, dst = str(tmp_path / "ge2e.pt"), str(tmp_path / "ge2e.npz")
    torch.save(sd, src)
    convert_ge2e(src, dst)
    enc = DVectorEncoder(weights_npz=dst)
    assert enc.calibrated

    # parity of the embedding math on the fabricated official weights
    from metatts_tpu.models.speaker_encoder import ge2e_embed
    import jax.numpy as jnp
    x = np.random.RandomState(2).randn(2, 40, 40).astype(np.float32)
    ours = np.asarray(ge2e_embed(enc.params, jnp.asarray(x)))
    with torch.no_grad():
        h, _ = lstm(torch.tensor(x))
        e = torch.relu(lin(h[:, -1]))
        theirs = (e / e.norm(dim=1, keepdim=True)).numpy()
    assert np.abs(ours - theirs).max() < 1e-5


def test_vocoder_wrapper_loads_npz(tmp_path):
    from convert_torch_weights import convert_melgan

    torch.manual_seed(3)
    g = _torch_melgan().eval()
    src, dst = str(tmp_path / "m.pt"), str(tmp_path / "m.npz")
    torch.save(g.state_dict(), src)
    convert_melgan(src, dst)
    v = Vocoder({"vocoder": {"model": "MelGAN", "weights_npz": dst}})
    assert v.pretrained
    wavs = v.infer(np.zeros((1, 8, 80), np.float32))
    assert wavs[0].shape == (8 * 256,)
