"""Pseudo-MOS adapters (reference ``evaluation/compute_mos.py:25,52``).

The reference scores synthesized audio with MOSNet (via the speechmetrics
package) and MBNet — pretrained torch models that are not shipped here.
This module defines the adapter surface so scorers plug in when their
weights/packages are available, plus a spectral-clarity proxy so the
pipeline runs end-to-end without them (clearly labeled as a proxy, never a
substitute for the published numbers).
"""

import os

import numpy as np

_SCORERS = {}


def register_scorer(name):
    def deco(fn):
        _SCORERS[name] = fn
        return fn
    return deco


def available_scorers():
    return sorted(_SCORERS)


def mean_confidence_interval(data, confidence=0.95):
    """Mean and half-width of the t-distribution confidence interval —
    the reference's ``get_mean_confidence_interval``
    (``evaluation/compute_mos.py:173-178``), used for every
    ``txt/<corpus>/<net>.txt`` row."""
    import scipy.stats
    a = np.asarray(data, np.float64)
    n = len(a)
    m = float(np.mean(a))
    if n < 2:
        return m, 0.0
    se = scipy.stats.sem(a)
    h = float(se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1))
    return m, h


def score(name, wav, sr):
    if name not in _SCORERS:
        raise KeyError(
            f"MOS scorer {name!r} unavailable (have {available_scorers()}); "
            "MOSNet/MBNet require external pretrained weights")
    return _SCORERS[name](wav, sr)


@register_scorer("spectral_proxy")
def _spectral_proxy(wav, sr):
    """Crude clarity proxy: harmonic-band energy concentration + non-silence
    ratio, mapped to [1, 5]. NOT MOSNet — a plumbing placeholder."""
    wav = np.asarray(wav, np.float64)
    if wav.size < 1024 or not np.isfinite(wav).all():
        return 1.0
    wav = wav / (np.abs(wav).max() + 1e-9)
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    spec = spec / (spec.sum() + 1e-12)
    entropy = -np.sum(spec * np.log(spec + 1e-12))
    max_entropy = np.log(len(spec))
    concentration = 1.0 - entropy / max_entropy       # 0 noise .. 1 tonal
    active = np.mean(np.abs(wav) > 0.01)
    raw = 0.7 * concentration + 0.3 * active
    return float(1.0 + 4.0 * np.clip(raw, 0, 1))


def try_register_mosnet():
    """Register MOSNet when the speechmetrics package exists (it does not in
    this image; the hook keeps parity with compute_mos.py)."""
    try:
        import speechmetrics  # noqa: F401
    except ImportError:
        return False

    metrics = speechmetrics.load("mosnet", None)

    @register_scorer("mosnet")
    def _mosnet(wav, sr):
        return float(metrics(wav, rate=sr)["mosnet"].mean())

    return True


def try_register_mosnet_native(weights_path=None):
    """Register the JAX-native MOSNet (evaluation/mosnet.py) when converted
    official weights are present — the file-drop path for the Keras
    ``cnn_blstm.h5`` that speechmetrics loads (reference
    ``compute_mos.py:25``; convert with
    ``tools/convert_torch_weights.py mosnet``).  Takes priority over the
    speechmetrics hook under the same scorer name."""
    weights_path = weights_path or os.environ.get("METATTS_MOSNET_WEIGHTS")
    if not weights_path or not os.path.exists(weights_path):
        return False
    from .mosnet import MOSNet
    model = MOSNet(weights_path)

    @register_scorer("mosnet")
    def _mosnet_native(wav, sr):
        return model.score(wav, sr)

    return True


def try_register_mbnet(weights_path=None):
    """Register MBNet pseudo-MOS (reference ``compute_mos.py:144-166``):
    the reference imports ``Pytorch_MBNet.model.MBNet(num_judges=5000)``,
    loads ``Pytorch_MBNet/pre_trained/model-50000.pt``, and scores the
    16 kHz magnitude STFT (n_fft=512) with ``only_mean_inference``.  This
    hook mirrors that exactly when the package + checkpoint are present
    (they are external downloads, absent in this image)."""
    try:
        import torch
        from Pytorch_MBNet.model import MBNet  # noqa: external package
    except ImportError:
        return False
    weights_path = weights_path or os.path.join(
        "Pytorch_MBNet", "pre_trained", "model-50000.pt")
    if not os.path.exists(weights_path):
        return False
    mbnet = MBNet(num_judges=5000)
    mbnet.load_state_dict(torch.load(weights_path, map_location="cpu"))
    mbnet.eval()

    @register_scorer("mbnet")
    def _mbnet(wav, sr):
        from ..preprocess.audio_io import resample
        if sr != 16000:
            wav = resample(np.asarray(wav, np.float32), sr, 16000)
        # |STFT| magnitude, n_fft=512, torch defaults (hop 128, centered),
        # shape (1, T, 257) — the reference's MBNetDataset.__getitem__
        x = torch.tensor(np.asarray(wav, np.float32))
        spec = torch.stft(x, n_fft=512, hop_length=128,
                          window=torch.hann_window(512),
                          return_complex=True).abs().T[None]
        with torch.no_grad():
            return float(mbnet.only_mean_inference(spectrum=spec).mean())

    return True


def try_register_mbnet_native(weights_path=None):
    """Register the JAX-native MBNet mean net (evaluation/mbnet.py) when
    converted official weights are present — the file-drop path for the
    ``Pytorch_MBNet/pre_trained/model-50000.pt`` checkpoint the reference
    loads (``compute_mos.py:148``; convert with
    ``tools/convert_torch_weights.py mbnet``).  Takes priority over the
    external-package hook under the same scorer name."""
    weights_path = weights_path or os.environ.get("METATTS_MBNET_WEIGHTS")
    if not weights_path or not os.path.exists(weights_path):
        return False
    from .mbnet import MBNetMean
    model = MBNetMean(weights_path)

    @register_scorer("mbnet")
    def _mbnet_native(wav, sr):
        return model.score(wav, sr)

    return True


def try_register_wav2vec2_native(weights_path=None):
    """Register the JAX-native wav2vec2 scorer (evaluation/wav2vec2.py) when
    converted official weights are present — the file-drop path for the
    ``facebook/wav2vec2-base`` checkpoint the reference's SSL scorer family
    builds on (``compute_mos.py:205,320``; convert with
    ``tools/convert_torch_weights.py wav2vec2``).  Takes priority over the
    transformers hook under the same scorer name.  With a converted MOS
    regression head the score is calibrated; otherwise the embedding-norm
    proxy applies and stays labeled uncalibrated."""
    weights_path = weights_path or os.environ.get("METATTS_WAV2VEC2_WEIGHTS")
    if not weights_path or not os.path.exists(weights_path):
        return False
    from .wav2vec2 import Wav2Vec2Scorer
    model = Wav2Vec2Scorer(weights_path)

    @register_scorer("wav2vec2")
    def _w2v2_native(wav, sr):
        return model.score(wav, sr)

    return True


def try_register_wav2vec2():
    """Register the wav2vec2-based quality score (reference
    ``evaluation/txt/LibriTTS/wav2vec2.txt`` rows) when transformers can
    load the pretrained model (needs network/weights; absent here)."""
    try:
        from transformers import Wav2Vec2Model, Wav2Vec2FeatureExtractor
        # local_files_only: use a cached download if present, fail fast
        # otherwise (no network retries in an egress-blocked environment)
        model = Wav2Vec2Model.from_pretrained("facebook/wav2vec2-base",
                                              local_files_only=True)
        fe = Wav2Vec2FeatureExtractor.from_pretrained(
            "facebook/wav2vec2-base", local_files_only=True)
    except Exception:
        return False

    import numpy as _np

    @register_scorer("wav2vec2")
    def _w2v2(wav, sr):
        import torch
        inputs = fe(wav, sampling_rate=sr, return_tensors="pt")
        with torch.no_grad():
            h = model(**inputs).last_hidden_state
        # embedding-norm proxy score in [1, 5]
        return float(1.0 + 4.0 * torch.sigmoid(h.norm(dim=-1).mean()
                                               - 5.0))

    return True
