"""Neural vocoders: MelGAN and HiFi-GAN generators (mel -> waveform).

The reference loads a TorchScript MelGAN from torch.hub and optionally
HiFi-GAN (``lightning/utils.py:8-30``, ``utils/model.py:13-50``).  Here both
generators are pure-functional JAX with the upstream architectures, so
officially released weights can be converted 1:1 (weight-norm folded into
plain kernels):

  MelGAN (descriptinc/melgan-neurips, ngf=32, hop 256):
    conv7(80->512) -> [upsample x8, x8, x2, x2; each = leaky_relu +
    convT(k=2r, s=r) + 3 residual blocks (dilations 1, 3, 9)] -> conv7 -> tanh
  HiFi-GAN (jik876, config v1):
    conv7(80->512) -> [convT upsample (8,8,2,2) + MRF resblocks
    k=(3,7,11) d=((1,3,5),)x3] -> conv7 -> tanh

Conventions preserved: input mel is natural-log scale divided by ln(10)
(the reference's MelGAN convention, ``lightning/utils.py:23``); output is
float in [-1,1], scaled to int16 by ``max_wav_value``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import nn

LEAKY = 0.2


def _leaky(x):
    return jax.nn.leaky_relu(x, LEAKY)


# ----------------------------------------------------------------- MelGAN

MELGAN_RATIOS = (8, 8, 2, 2)
MELGAN_NGF = 32
MELGAN_DILATIONS = (1, 3, 9)


def melgan_init(rng, n_mels=80, ngf=MELGAN_NGF, ratios=MELGAN_RATIOS):
    mult = int(2 ** len(ratios))
    keys = jax.random.split(rng, 2 + len(ratios))
    params = {"conv_in": nn.conv1d_init(keys[0], n_mels, mult * ngf, 7)}
    ups = []
    for i, r in enumerate(ratios):
        c_in, c_out = mult * ngf, mult * ngf // 2
        k1, k2 = jax.random.split(keys[1 + i])
        blocks = []
        bkeys = jax.random.split(k2, len(MELGAN_DILATIONS))
        for d, bk in zip(MELGAN_DILATIONS, bkeys):
            ka, kb, kc = jax.random.split(bk, 3)
            blocks.append({
                "conv_d": nn.conv1d_init(ka, c_out, c_out, 3),
                "conv_1": nn.conv1d_init(kb, c_out, c_out, 1),
                "shortcut": nn.conv1d_init(kc, c_out, c_out, 1),
            })
        ups.append({
            "convt": nn.conv_transpose1d_init(k1, c_in, c_out, 2 * r),
            "blocks": blocks,
        })
        mult //= 2
    params["ups"] = ups
    params["conv_out"] = nn.conv1d_init(keys[-1], ngf, 1, 7)
    return params


def melgan_apply(params, mel, cdtype=jnp.float32):
    """mel: (B, T, n_mels) natural-log mel -> (B, T*256) wav in [-1,1]."""
    x = mel / math.log(10.0)  # reference log10 convention
    x = nn.conv1d(params["conv_in"], x, cdtype)
    for up, r in zip(params["ups"], MELGAN_RATIOS):
        x = _leaky(x)
        x = nn.conv_transpose1d(up["convt"], x, stride=r, cdtype=cdtype,
                                padding=r // 2 + r % 2)
        for blk, d in zip(up["blocks"], MELGAN_DILATIONS):
            h = _leaky(x)
            h = nn.conv1d(blk["conv_d"], h, cdtype, dilation=d)
            h = _leaky(h)
            h = nn.conv1d(blk["conv_1"], h, cdtype)
            x = nn.conv1d(blk["shortcut"], x, cdtype) + h
    x = _leaky(x)
    x = nn.conv1d(params["conv_out"], x, cdtype)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------- HiFi-GAN

HIFIGAN_UPSAMPLE_RATES = (8, 8, 2, 2)
HIFIGAN_UPSAMPLE_KERNELS = (16, 16, 4, 4)
HIFIGAN_RESBLOCK_KERNELS = (3, 7, 11)
HIFIGAN_RESBLOCK_DILATIONS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def hifigan_init(rng, n_mels=80, upsample_initial_channel=512):
    keys = jax.random.split(rng, 3 + len(HIFIGAN_UPSAMPLE_RATES))
    params = {"conv_pre": nn.conv1d_init(keys[0], n_mels,
                                         upsample_initial_channel, 7)}
    ups = []
    c = upsample_initial_channel
    for i, (r, k) in enumerate(zip(HIFIGAN_UPSAMPLE_RATES,
                                   HIFIGAN_UPSAMPLE_KERNELS)):
        c_out = c // 2
        uk = jax.random.split(keys[1 + i], 1 + len(HIFIGAN_RESBLOCK_KERNELS))
        res = []
        for j, (rk, rds) in enumerate(zip(HIFIGAN_RESBLOCK_KERNELS,
                                          HIFIGAN_RESBLOCK_DILATIONS)):
            rkeys = jax.random.split(uk[1 + j], 2 * len(rds))
            convs1 = [nn.conv1d_init(rkeys[2 * m], c_out, c_out, rk)
                      for m in range(len(rds))]
            convs2 = [nn.conv1d_init(rkeys[2 * m + 1], c_out, c_out, rk)
                      for m in range(len(rds))]
            res.append({"convs1": convs1, "convs2": convs2})
        ups.append({"convt": nn.conv_transpose1d_init(uk[0], c, c_out, k),
                    "res": res})
        c = c_out
    params["ups"] = ups
    params["conv_post"] = nn.conv1d_init(keys[-1], c, 1, 7)
    return params


def hifigan_apply(params, mel, cdtype=jnp.float32):
    """mel: (B, T, n_mels) natural-log mel -> (B, T*256) wav in [-1,1]."""
    x = nn.conv1d(params["conv_pre"], mel, cdtype)
    for up, r, k in zip(params["ups"], HIFIGAN_UPSAMPLE_RATES,
                        HIFIGAN_UPSAMPLE_KERNELS):
        x = _leaky(x)
        x = nn.conv_transpose1d(up["convt"], x, stride=r, cdtype=cdtype,
                                padding=(k - r) // 2)
        acc = None
        for rb, rds in zip(up["res"], HIFIGAN_RESBLOCK_DILATIONS):
            h = x
            for c1, c2, d in zip(rb["convs1"], rb["convs2"], rds):
                y = _leaky(h)
                y = nn.conv1d(c1, y, cdtype, dilation=d)
                y = _leaky(y)
                y = nn.conv1d(c2, y, cdtype)
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(up["res"])
    x = _leaky(x)
    x = nn.conv1d(params["conv_post"], x, cdtype)
    return jnp.tanh(x)[..., 0]


# ----------------------------------------------------------------- wrapper

class Vocoder:
    """Host wrapper mirroring ``LightningMelGAN.infer``
    (``lightning/utils.py:16-30``)."""

    def __init__(self, model_cfg, rng=None, n_mels=80):
        self.kind = model_cfg["vocoder"]["model"]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if self.kind == "MelGAN":
            self.params = melgan_init(rng, n_mels=n_mels)
            self._apply = jax.jit(melgan_apply)
        elif self.kind == "HiFi-GAN":
            self.params = hifigan_init(rng, n_mels=n_mels)
            self._apply = jax.jit(hifigan_apply)
        else:
            raise ValueError(f"unknown vocoder {self.kind!r}")

    def infer(self, mels, max_wav_value=32768.0, lengths=None):
        """mels (B, T, n_mels) -> list of int16 numpy wavs."""
        wavs = np.asarray(self._apply(self.params, jnp.asarray(mels)))
        wavs = (wavs * max_wav_value).astype(np.int16)
        out = []
        for i in range(wavs.shape[0]):
            w = wavs[i]
            if lengths is not None:
                w = w[: int(lengths[i])]
            out.append(w)
        return out
