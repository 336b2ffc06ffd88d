"""EER-pipeline mechanics for the meta-advantage-in-EER-space experiment.

``tools/exp_meta_eer.py`` reproduces the reference's headline artifact —
the EER-vs-adaptation-steps table (``evaluation/txt/LibriTTS/eer.txt``,
built by ``evaluation/speaker_verification.py:20`` +
``wavs_to_dvector.py:18``) — with zero external weights: Griffin-Lim
pseudo-vocoder audio + a scratch-trained GE2E verifier.  The full
experiment (meta vs baseline training + synthesis + evaluation) runs for
hours and its result is recorded in ``examples/meta_advantage_eer/``;
these tests guard the pieces that make the number MEANINGFUL at CI scale:

1. the scratch GE2E trainer learns real speaker structure from
   Griffin-Lim audio of the synthetic corpus (not just synthetic
   features), and its npz export drives ``DVectorEncoder`` + the standard
   similarity/EER stack to a far-below-chance EER on held-out utterances;
2. the resemblyzer-layout export/load roundtrip is embedding-exact;
3. short-utterance handling loops audio instead of zero-padding it
   (``refmel.tile_to_min_length`` — a zero tail relaxes the GE2E LSTM's
   final-hidden readout to an input-independent fixed point and was
   measured to collapse every short utterance to the same d-vector);
4. the Griffin-Lim pseudo-vocoder (``data/synthetic.SyntheticMelVocoder``)
   emits sane peak-normalized audio trimmed per ``mel_lens``;
5. ``evaluate.derive_descriptions_path`` swaps only the LAST /result/
   segment (task->speaker regrouping resolves the right log dir even for
   paths containing /result/ twice).
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from metatts_tpu.data.synthetic import SyntheticVoices, SyntheticMelVocoder
from metatts_tpu.evaluation.ge2e_scratch import (train_ge2e, save_ge2e_npz,
                                                 utterance_partial)
from metatts_tpu.evaluation.similarity import pair_similarity
from metatts_tpu.evaluation.verification import speaker_verification_eer
from metatts_tpu.preprocess.refmel import tile_to_min_length, PARTIAL_SAMPLES

N_SPK = 10
N_UTT = 8
N_MELS = 8


@pytest.fixture(scope="module")
def corpus_and_vocoder():
    corpus = SyntheticVoices(n_speakers=N_SPK, n_mels=N_MELS, seed=0)
    voc = SyntheticMelVocoder(n_mels=N_MELS, n_iters=16, seed=0)
    return corpus, voc


def _speaker_wavs(corpus, voc, speaker, n, seed):
    batch = corpus.batch([speaker] * n, np.random.RandomState(seed))
    return voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))


@pytest.fixture(scope="module")
def trained_ge2e(corpus_and_vocoder):
    """Scratch GE2E trained on Griffin-Lim partials of the synthetic
    corpus — the exact frontend the EER experiment uses."""
    corpus, voc = corpus_and_vocoder
    partials = {}
    for s in range(N_SPK):
        wavs = _speaker_wavs(corpus, voc, s, N_UTT, 100 + s)
        partials[s] = np.stack([utterance_partial(w, voc.sr) for w in wavs])
    # hidden 96 / 240 steps: measured EER 0.033 at this scale (hidden 64 /
    # 120 steps left the pair distributions overlapping at EER ~0.3)
    params, trace = train_ge2e(
        partials, hidden=96, embed=96, steps=240, n_speakers_per_batch=8,
        m_utts_per_speaker=4, seed=0)
    return params, trace


def test_ge2e_scratch_learns_on_griffin_lim_audio(trained_ge2e):
    params, trace = trained_ge2e
    # untrained GE2E sits on the uniform-softmax plateau at ln(N)=2.079
    assert trace[0] > 1.8, trace[0]
    assert min(trace) < 0.3, (
        f"GE2E failed to learn on GL partials: min loss {min(trace):.3f} "
        f"(trace tail {trace[-5:]})")


def test_npz_export_roundtrip_is_embedding_exact(trained_ge2e,
                                                 corpus_and_vocoder,
                                                 tmp_path):
    from metatts_tpu.evaluation.dvector import DVectorEncoder
    from metatts_tpu.models.speaker_encoder import ge2e_embed

    params, _ = trained_ge2e
    corpus, voc = corpus_and_vocoder
    npz = str(tmp_path / "ge2e.npz")
    save_ge2e_npz(params, npz)
    enc = DVectorEncoder(weights_npz=npz, require_weights=True)
    assert enc.calibrated

    wav = _speaker_wavs(corpus, voc, 0, 1, 999)[0]
    P = utterance_partial(wav, voc.sr)[None]
    want = np.asarray(ge2e_embed(params["net"], jnp.asarray(P)))[0]
    got = np.asarray(enc._embed(enc.params, jnp.asarray(P)))[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_heldout_eer_far_below_chance(trained_ge2e, corpus_and_vocoder,
                                      tmp_path):
    """Fresh (held-out) utterances of the training speakers, embedded via
    the standard DVectorEncoder -> pair-similarity -> EER stack, must
    verify far below chance — the property that makes the experiment's
    synth-wav EER table meaningful."""
    from metatts_tpu.evaluation.dvector import DVectorEncoder

    params, _ = trained_ge2e
    corpus, voc = corpus_and_vocoder
    npz = str(tmp_path / "ge2e.npz")
    save_ge2e_npz(params, npz)
    enc = DVectorEncoder(weights_npz=npz, require_weights=True)

    groups = {}
    for s in range(6):
        wavs = _speaker_wavs(corpus, voc, s, 4, 500 + s)
        groups[s] = np.stack([enc.embed_utterance(w, voc.sr) for w in wavs])
    same, diff = pair_similarity(groups)
    r = speaker_verification_eer(same, diff)
    assert np.isfinite(r["eer"])
    assert r["eer"] < 0.25, (
        f"held-out EER {r['eer']:.3f} not far below chance 0.5 "
        f"(same {np.mean(same):.3f} vs diff {np.mean(diff):.3f})")


def test_tile_to_min_length_semantics():
    rng = np.random.default_rng(0)
    short = rng.standard_normal(5000).astype(np.float32)
    tiled = tile_to_min_length(short)
    assert len(tiled) == PARTIAL_SAMPLES
    # looped, not zero-padded: the tail repeats the signal
    np.testing.assert_array_equal(tiled[:5000], short)
    np.testing.assert_array_equal(tiled[5000:10000], short)
    assert np.abs(tiled[-1000:]).max() > 0
    # long audio untouched (identity, not a copy requirement)
    long = rng.standard_normal(PARTIAL_SAMPLES + 7).astype(np.float32)
    np.testing.assert_array_equal(tile_to_min_length(long), long)
    # degenerate empty input -> silence of one partial
    z = tile_to_min_length(np.zeros(0, np.float32))
    assert len(z) == PARTIAL_SAMPLES and not z.any()


def test_synthetic_mel_vocoder_output(corpus_and_vocoder):
    corpus, voc = corpus_and_vocoder
    batch = corpus.batch([0, 1], np.random.RandomState(3))
    wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
    assert len(wavs) == 2
    for b, w in enumerate(wavs):
        assert w.dtype == np.float32
        assert len(w) == int(batch.mel_lens[b]) * voc.hop
        assert np.isfinite(w).all()
        assert 0.5 < np.abs(w).max() <= 0.91     # peak-normalized to 0.9


def test_result_tree_cache_keys_do_not_collide_across_modes(tmp_path):
    """Two result trees (e.g. meta vs baseline modes) share task names AND
    wav basenames; the harness d-vector cache must still keep them apart.
    Regression: the cache key once omitted the result dir, so the second
    mode evaluated silently reused the first mode's cached d-vectors —
    every meta EER row equalled the baseline row bit-for-bit."""
    from metatts_tpu.evaluation.harness import EvaluationHarness
    from metatts_tpu.preprocess.audio_io import save_wav

    rng = np.random.default_rng(7)
    for mode, freq in (("meta", 220.0), ("baseline", 880.0)):
        d = tmp_path / "result" / mode / "audio" / "Testing" / "step_last" \
            / "test_000"
        d.mkdir(parents=True)
        t = np.arange(16000, dtype=np.float32) / 16000.0
        w = (0.5 * np.sin(2 * np.pi * freq * t)
             + 0.01 * rng.standard_normal(16000).astype(np.float32))
        save_wav(str(d / "qry00.step_last-FTstep_10.synth.wav"),
                 w.astype(np.float32), 16000)

    h = EvaluationHarness(cache_dir=str(tmp_path / "cache"))
    g_meta = h.embed_result_tree(str(tmp_path / "result" / "meta"),
                                 "synth", ft_step=10)
    g_base = h.embed_result_tree(str(tmp_path / "result" / "baseline"),
                                 "synth", ft_step=10)
    assert g_meta and g_base
    assert not np.allclose(g_meta["test_000"], g_base["test_000"]), \
        "distinct trees returned identical embeddings: cache collision"
    # and the cache itself is coherent: re-embedding each tree hits its
    # OWN entry
    np.testing.assert_array_equal(
        h.embed_result_tree(str(tmp_path / "result" / "meta"), "synth",
                            ft_step=10)["test_000"], g_meta["test_000"])


def test_derive_descriptions_path_last_segment_only():
    import evaluate as evaluate_cli

    sep = os.sep
    p = sep.join(["", "data", "result", "output", "result", "meta_vad"])
    want = sep.join(["", "data", "result", "output", "log", "meta_vad",
                     "test_descriptions.json"])
    assert evaluate_cli.derive_descriptions_path(p) == want
    # no /result/ segment -> stays in place
    q = sep.join(["", "tmp", "outdir", "mode"])
    assert evaluate_cli.derive_descriptions_path(q) == os.path.join(
        q, "test_descriptions.json")
