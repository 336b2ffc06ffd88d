"""Accuracy envelope of the native C++ F0 extractor (csrc/world.cpp) on
hostile-but-synthesizable speech phenomena — as far toward SURVEY §2.3's
"validated against pyworld output" as an image without pyworld allows
(reference call site: ``preprocessor/preprocessor.py:215-220``).

Each case synthesizes a controlled signal, runs the native DIO-style
extractor AND the repo's numpy YIN cross-check, and bounds the cent error
and voicing agreement.  A golden-fixture hook at the bottom validates
against real pyworld vectors the moment someone drops
``tests/fixtures/pyworld_golden.npz`` (wav, sr, frame_period_ms, f0) from a
machine that has pyworld — until then it skips."""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "pyworld_golden.npz")
SR = 22050
PER_MS = 256 / SR * 1000          # the corpus hop the preprocessor uses


def _harmonic(f0_curve, sr=SR, n_harm=4, amp_jitter=None, rng=None):
    """Additive-harmonic voice with 1/h amplitude rolloff."""
    phase = 2 * np.pi * np.cumsum(f0_curve) / sr
    sig = sum(np.sin(h * phase) / h for h in range(1, n_harm + 1))
    sig = sig / np.abs(sig).max()
    if amp_jitter:                              # shimmer: per-period AM
        lfo = 1 + amp_jitter * rng.randn(len(sig) // 128 + 1)
        sig = sig * np.repeat(lfo, 128)[:len(sig)]
    return sig.astype(np.float64)


def _cents(f, ref):
    return 1200 * np.abs(np.log2(f / ref))


def _run(x):
    from metatts_tpu.preprocess.pitch import extract_f0
    fn = extract_f0(x, SR, PER_MS, use_native="require")
    fy = extract_f0(x, SR, PER_MS, use_native=False)
    return fn, fy


def _voiced_err(fn, truth, margin=4):
    """Median cent error + voiced recall over the interior frames."""
    hop = SR * PER_MS / 1000
    idx = np.arange(margin, len(fn) - margin)
    t = truth[(idx * hop).astype(int)]
    v = fn[idx] > 0
    err = _cents(fn[idx][v], t[v])
    return float(np.median(err)), float(np.mean(v))


def test_vibrato_tracking():
    """6 Hz, ±3% vibrato around 180 Hz — the extractor must follow the
    modulation, not smear it (median < 35 cents, recall > 0.9)."""
    t = np.arange(int(SR * 1.0)) / SR
    f0 = 180 * (1 + 0.03 * np.sin(2 * np.pi * 6 * t))
    x = _harmonic(f0)
    fn, _ = _run(x)
    med, recall = _voiced_err(fn, f0)
    assert recall > 0.9
    assert med < 35, med


def test_jitter_and_shimmer():
    """2% cycle-to-cycle frequency jitter + 10% shimmer (pathological-voice
    territory): tracking may coarsen but must not octave-jump."""
    rng = np.random.RandomState(1)
    n = int(SR * 1.0)
    jit = 1 + 0.02 * np.repeat(rng.randn(n // 160 + 1), 160)[:n]
    f0 = 140 * jit
    x = _harmonic(f0, amp_jitter=0.10, rng=rng)
    fn, _ = _run(x)
    med, recall = _voiced_err(fn, f0)
    assert recall > 0.8
    assert med < 60, med
    v = fn[fn > 0]
    assert np.mean(_cents(v, 140) > 600) < 0.05   # octave jumps are rare


@pytest.mark.parametrize("snr_db,max_cents,min_recall",
                         [(20, 30, 0.9), (10, 40, 0.8), (5, 60, 0.6)])
def test_additive_noise_snr(snr_db, max_cents, min_recall):
    """Steady 200 Hz voice under white noise at several SNRs: graceful
    degradation, no catastrophic voicing collapse down to 5 dB."""
    rng = np.random.RandomState(2)
    n = int(SR * 1.0)
    f0 = np.full(n, 200.0)
    x = _harmonic(f0)
    noise = rng.randn(n)
    noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()
                     / 10 ** (snr_db / 10))
    fn, _ = _run(x + noise)
    med, recall = _voiced_err(fn, f0)
    assert recall > min_recall, (snr_db, recall)
    assert med < max_cents, (snr_db, med)


def test_low_f0_no_octave_doubling():
    """75 Hz male-range voice with a strong 2nd harmonic — the classic
    octave-error bait: DIO-style period scoring must pick the fundamental,
    not 150 Hz.  (75 and not 70 because the extractor's pyworld-matching
    default floor is 71 Hz — pyworld itself would zero a 70 Hz voice.)"""
    n = int(SR * 1.0)
    t = np.arange(n) / SR
    phase = 2 * np.pi * 75 * t
    x = 0.4 * np.sin(phase) + 0.8 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase)
    fn, _ = _run(x)
    v = fn[4:-4]
    v = v[v > 0]
    assert len(v) > 20
    # majority of voiced frames at the true fundamental (within a semitone)
    assert np.mean(_cents(v, 75) < 100) > 0.7, np.median(v)


def test_voicing_boundary_localization():
    """Noise -> voice -> noise: the voiced/unvoiced boundary must land
    within ~4 frames of truth on each side, and native/YIN must agree on
    voicing for >85% of frames."""
    rng = np.random.RandomState(3)
    sil = 0.05 * rng.randn(int(SR * 0.4))
    n = int(SR * 0.6)
    f0 = np.full(n, 160.0)
    x = np.concatenate([sil, _harmonic(f0), sil])
    fn, fy = _run(x)
    hop = SR * PER_MS / 1000
    b0, b1 = int(len(sil) / hop), int((len(sil) + n) / hop)
    inner = fn[b0 + 4:b1 - 4]
    assert np.mean(inner > 0) > 0.9
    outer = np.concatenate([fn[2:b0 - 4], fn[b1 + 4:-2]])
    assert np.mean(outer > 0) < 0.15
    agree = np.mean((fn > 0) == (fy > 0))
    assert agree > 0.85, agree


def test_against_pyworld_golden_fixture():
    """Drop-in validation against REAL pyworld output: generate the fixture
    on any machine with pyworld via

        import pyworld, numpy as np
        f0, t = pyworld.dio(wav, sr, frame_period=pm)
        f0 = pyworld.stonemask(wav, f0, t, sr)
        np.savez("tests/fixtures/pyworld_golden.npz",
                 wav=wav, sr=sr, frame_period_ms=pm, f0=f0)

    and this test starts enforcing <50-cent median agreement on voiced
    frames plus >85% voicing agreement."""
    if not os.path.exists(FIXTURE):
        pytest.skip("no pyworld golden fixture (environment has no pyworld)")
    from metatts_tpu.preprocess.pitch import extract_f0
    z = np.load(FIXTURE)
    fn = extract_f0(np.asarray(z["wav"], np.float64), int(z["sr"]),
                    float(z["frame_period_ms"]), use_native="require")
    ref = z["f0"][:len(fn)]
    fn = fn[:len(ref)]
    both = (fn > 0) & (ref > 0)
    assert np.mean((fn > 0) == (ref > 0)) > 0.85
    assert np.median(_cents(fn[both], ref[both])) < 50
