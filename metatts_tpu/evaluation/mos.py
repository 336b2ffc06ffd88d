"""Pseudo-MOS adapters (reference ``evaluation/compute_mos.py:25,52``).

The reference scores synthesized audio with MOSNet (via the speechmetrics
package) and MBNet — pretrained torch models that are not shipped here.
This module defines the adapter surface so scorers plug in when their
weights/packages are available, plus a spectral-clarity proxy so the
pipeline runs end-to-end without them (clearly labeled as a proxy, never a
substitute for the published numbers).
"""

import numpy as np

_SCORERS = {}


def register_scorer(name):
    def deco(fn):
        _SCORERS[name] = fn
        return fn
    return deco


def available_scorers():
    return sorted(_SCORERS)


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


def try_register_wav2vec2():
    """Register the wav2vec2-based quality score (reference
    ``evaluation/txt/LibriTTS/wav2vec2.txt`` rows) when transformers can
    load the pretrained model (needs network/weights; absent here)."""
    try:
        from transformers import Wav2Vec2Model, Wav2Vec2FeatureExtractor
        model = Wav2Vec2Model.from_pretrained("facebook/wav2vec2-base")
        fe = Wav2Vec2FeatureExtractor.from_pretrained(
            "facebook/wav2vec2-base")
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
