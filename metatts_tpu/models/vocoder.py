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


def _reflect_conv(p, x, cdtype, dilation=1):
    """Conv1d with REFLECTION padding — the official descriptinc generator
    wraps its k>1 convs in nn.ReflectionPad1d; zero (SAME) padding would
    break bit-parity with released weights at the sequence edges."""
    K = p["w"].shape[-1]
    pad = dilation * (K - 1) // 2
    if pad == 0:
        return nn.conv1d(p, x, cdtype)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = nn.conv1d(p, xp, cdtype, dilation=dilation)
    return y[:, pad:-pad]


def melgan_apply(params, mel, cdtype=jnp.float32):
    """mel: (B, T, n_mels) natural-log mel -> (B, T*256) wav in [-1,1]."""
    x = mel / math.log(10.0)  # reference log10 convention
    x = _reflect_conv(params["conv_in"], x, cdtype)
    for up, r in zip(params["ups"], MELGAN_RATIOS):
        x = _leaky(x)
        x = nn.conv_transpose1d(up["convt"], x, stride=r, cdtype=cdtype,
                                padding=r // 2 + r % 2)
        for blk, d in zip(up["blocks"], MELGAN_DILATIONS):
            h = _leaky(x)
            h = _reflect_conv(blk["conv_d"], h, cdtype, dilation=d)
            h = _leaky(h)
            h = nn.conv1d(blk["conv_1"], h, cdtype)
            x = nn.conv1d(blk["shortcut"], x, cdtype) + h
    x = _leaky(x)
    x = _reflect_conv(params["conv_out"], x, cdtype)
    return jnp.tanh(x)[..., 0]


def melgan_params_from_npz(w):
    """Map the descriptinc melgan-neurips generator state dict (official
    ``model.<idx>`` nn.Sequential layout; weight-norm already folded by
    ``tools/convert_torch_weights.py``) into the ``melgan_init`` pytree.

    Sequential indices in the official Generator: 0 ReflectionPad,
    1 conv_in(80->512,k7); then per upsample ratio [LeakyReLU,
    ConvTranspose1d, ResnetBlock x3] (5 entries); finally LeakyReLU,
    ReflectionPad, conv_out(32->1,k7), Tanh.  ResnetBlock children:
    ``block.2`` (dilated k3), ``block.4`` (k1), ``shortcut`` (k1).
    Conv kernels keep torch layout (OIH; transposed convs IOH) — identical
    to ``nn.conv1d_init`` conventions, so no transposition.
    """
    def conv(base):
        p = {"w": jnp.asarray(w[f"{base}.weight"])}
        if f"{base}.bias" in w:
            p["b"] = jnp.asarray(w[f"{base}.bias"])
        return p

    params = {"conv_in": conv("model.1")}
    ups = []
    idx = 2
    for _ in MELGAN_RATIOS:
        blocks = []
        for j in range(len(MELGAN_DILATIONS)):
            b = idx + 2 + j
            blocks.append({"conv_d": conv(f"model.{b}.block.2"),
                           "conv_1": conv(f"model.{b}.block.4"),
                           "shortcut": conv(f"model.{b}.shortcut")})
        ups.append({"convt": conv(f"model.{idx + 1}"), "blocks": blocks})
        idx += 2 + len(MELGAN_DILATIONS)
    params["ups"] = ups
    params["conv_out"] = conv(f"model.{idx + 2}")
    return params


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


HIFIGAN_LRELU = 0.1  # official jik876 LRELU_SLOPE (MelGAN uses 0.2)


def hifigan_apply(params, mel, cdtype=jnp.float32):
    """mel: (B, T, n_mels) natural-log mel -> (B, T*256) wav in [-1,1].

    Slope conventions follow the official generator exactly: 0.1 inside the
    upsample/MRF stack, torch's default 0.01 on the final activation before
    conv_post (``F.leaky_relu(x)`` with no slope argument in models.py).
    """
    x = nn.conv1d(params["conv_pre"], mel, cdtype)
    for up, r, k in zip(params["ups"], HIFIGAN_UPSAMPLE_RATES,
                        HIFIGAN_UPSAMPLE_KERNELS):
        x = jax.nn.leaky_relu(x, HIFIGAN_LRELU)
        x = nn.conv_transpose1d(up["convt"], x, stride=r, cdtype=cdtype,
                                padding=(k - r) // 2)
        acc = None
        for rb, rds in zip(up["res"], HIFIGAN_RESBLOCK_DILATIONS):
            h = x
            for c1, c2, d in zip(rb["convs1"], rb["convs2"], rds):
                y = jax.nn.leaky_relu(h, HIFIGAN_LRELU)
                y = nn.conv1d(c1, y, cdtype, dilation=d)
                y = jax.nn.leaky_relu(y, HIFIGAN_LRELU)
                y = nn.conv1d(c2, y, cdtype)
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(up["res"])
    x = jax.nn.leaky_relu(x, 0.01)
    x = nn.conv1d(params["conv_post"], x, cdtype)
    return jnp.tanh(x)[..., 0]


def hifigan_params_from_npz(w):
    """Map the jik876 HiFi-GAN v1 generator state dict (official key layout
    ``conv_pre / ups.<i> / resblocks.<3i+j>.convs{1,2}.<m> / conv_post``;
    weight-norm folded by the converter) into the ``hifigan_init`` pytree.
    HiFi-GAN uses zero padding, matching ``nn.conv1d`` SAME semantics."""
    def conv(base):
        p = {"w": jnp.asarray(w[f"{base}.weight"])}
        if f"{base}.bias" in w:
            p["b"] = jnp.asarray(w[f"{base}.bias"])
        return p

    n_res = len(HIFIGAN_RESBLOCK_KERNELS)
    params = {"conv_pre": conv("conv_pre")}
    ups = []
    for i in range(len(HIFIGAN_UPSAMPLE_RATES)):
        res = []
        for j in range(n_res):
            rb = i * n_res + j
            n_d = len(HIFIGAN_RESBLOCK_DILATIONS[j])
            res.append({
                "convs1": [conv(f"resblocks.{rb}.convs1.{m}")
                           for m in range(n_d)],
                "convs2": [conv(f"resblocks.{rb}.convs2.{m}")
                           for m in range(n_d)],
            })
        ups.append({"convt": conv(f"ups.{i}"), "res": res})
    params["ups"] = ups
    params["conv_post"] = conv("conv_post")
    return params


# ----------------------------------------------------------------- wrapper

class Vocoder:
    """Host wrapper mirroring ``LightningMelGAN.infer``
    (``lightning/utils.py:16-30``)."""

    def __init__(self, model_cfg, rng=None, n_mels=80, weights_npz=None):
        """``weights_npz``: converted official generator weights
        (``tools/convert_torch_weights.py``); defaults to
        ``model_cfg["vocoder"]["weights_npz"]``.  Without weights the
        generator is random-init — fine for plumbing, meaningless audio —
        and ``self.pretrained`` records which."""
        import os
        self.kind = model_cfg["vocoder"]["model"]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        weights_npz = weights_npz or model_cfg["vocoder"].get("weights_npz")
        loaded = None
        if weights_npz and os.path.exists(weights_npz):
            loaded = np.load(weights_npz)
        self.pretrained = loaded is not None
        if self.kind == "MelGAN":
            self.params = (melgan_params_from_npz(loaded) if loaded
                           else melgan_init(rng, n_mels=n_mels))
            self._apply = jax.jit(melgan_apply)
        elif self.kind == "HiFi-GAN":
            self.params = (hifigan_params_from_npz(loaded) if loaded
                           else hifigan_init(rng, n_mels=n_mels))
            self._apply = jax.jit(hifigan_apply)
        else:
            raise ValueError(f"unknown vocoder {self.kind!r}")
        if not self.pretrained:
            import warnings
            warnings.warn(
                f"{self.kind} vocoder running with RANDOM-INIT weights — "
                "synthesized audio is structurally valid but not speech; "
                "set model.vocoder.weights_npz to converted official "
                "weights (tools/convert_torch_weights.py)", stacklevel=2)

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
