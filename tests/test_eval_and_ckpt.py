import numpy as np
import jax
import jax.numpy as jnp

from metatts_tpu.evaluation.similarity import (centroid_similarity,
                                               pair_similarity)
from metatts_tpu.evaluation.verification import speaker_verification_eer
from metatts_tpu.evaluation.dvector import DVectorEncoder
from metatts_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                          average_speaker_rows)
from metatts_tpu.train.optim import noam_schedule


def _clustered_dvecs(rng, n_speakers=4, per=10, d=32, sep=3.0):
    out = {}
    for s in range(n_speakers):
        center = rng.randn(d) * sep
        v = center[None] + rng.randn(per, d)
        out[f"spk{s}"] = v / np.linalg.norm(v, axis=1, keepdims=True)
    return out


def test_eer_separable_clusters():
    rng = np.random.RandomState(0)
    dvecs = _clustered_dvecs(rng)
    same, diff = pair_similarity(dvecs)
    res = speaker_verification_eer(same, diff)
    assert res["eer"] < 0.1
    assert res["auc"] > 0.9
    # random clusters -> EER near 0.5
    rnd = _clustered_dvecs(rng, sep=0.0)
    same2, diff2 = pair_similarity(rnd)
    res2 = speaker_verification_eer(same2, diff2)
    assert 0.3 < res2["eer"] < 0.7


def test_centroid_similarity():
    rng = np.random.RandomState(1)
    enroll = rng.randn(5, 16) + 4.0
    test_same = rng.randn(3, 16) + 4.0
    test_diff = rng.randn(3, 16) - 4.0
    s1 = centroid_similarity(enroll, test_same)
    s2 = centroid_similarity(enroll, test_diff)
    assert s1.mean() > s2.mean()


def test_dvector_encoder_runs():
    enc = DVectorEncoder()
    sr = 22050
    t = np.arange(sr) / sr
    wav = 0.4 * np.sin(2 * np.pi * 150 * t)
    d = enc.embed_utterance(wav.astype(np.float32), sr)
    assert d.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)


def test_regroup_by_speaker_full_label_and_subtasks():
    """Pools are keyed by the FULL episode label so speakers with colliding
    numeric ids across corpora are never merged, and 1-shot sub-task ids
    ('test_NNN_k') resolve to episode NNN."""
    from metatts_tpu.evaluation.harness import EvaluationHarness
    descs = [{"label": "LibriTTS_en-spk_7"}, {"label": "VCTK_en-spk_7"}]
    groups = {
        "test_000": np.ones((2, 4)),
        "test_001": np.zeros((3, 4)),
        "test_000_1": np.full((1, 4), 2.0),   # 1-shot sub-task of episode 0
    }
    out = EvaluationHarness.regroup_by_speaker(groups, descs)
    assert set(out) == {"LibriTTS_en-spk_7", "VCTK_en-spk_7"}
    assert out["LibriTTS_en-spk_7"].shape == (3, 4)   # 2 + 1 (sub-task)
    assert out["VCTK_en-spk_7"].shape == (3, 4)
    # enrollment dirs named by bare id still match via the -spk_ suffix
    sims = EvaluationHarness.similarity_to_enrollment(
        {"7": np.ones((2, 4))}, {"LibriTTS_en-spk_7": np.ones((2, 4))})
    assert "LibriTTS_en-spk_7" in sims


def test_discover_ft_steps(tmp_path):
    import evaluate as ev   # repo root is on sys.path via conftest
    d = tmp_path / "audio" / "Testing" / "step_last" / "test_000"
    d.mkdir(parents=True)
    for n in (0, 5, 100):
        (d / f"u.step_last-FTstep_{n}.synth.wav").write_bytes(b"")
    (d / "u.recon.wav").write_bytes(b"")
    assert ev.discover_ft_steps(str(tmp_path), "step_last") == [0, 5, 100]


def test_mean_confidence_interval():
    from metatts_tpu.evaluation.mos import mean_confidence_interval
    import scipy.stats
    data = [3.0, 3.2, 2.8, 3.5, 3.1]
    m, h = mean_confidence_interval(data)
    np.testing.assert_allclose(m, np.mean(data))
    se = scipy.stats.sem(data)
    np.testing.assert_allclose(
        h, se * scipy.stats.t.ppf(0.975, len(data) - 1))
    # degenerate single sample: zero-width interval, no nan
    m1, h1 = mean_confidence_interval([4.0])
    assert m1 == 4.0 and h1 == 0.0


def test_mos_rows_per_ftstep(tmp_path):
    """mos_rows mirrors compute_mos.py: per-adaptation-step synth rows with
    mean ±CI, real/recon bands, and the MOS-vs-step figure."""
    import evaluate as ev
    from metatts_tpu.preprocess.audio_io import save_wav

    sr = 22050
    t = np.arange(sr // 4) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    real = tmp_path / "real" / "spk1"
    real.mkdir(parents=True)
    for i in range(2):
        save_wav(str(real / f"u{i}.wav"), tone, sr)
    res = tmp_path / "result"
    task = res / "audio" / "Testing" / "step_last" / "test_000"
    task.mkdir(parents=True)
    save_wav(str(task / "u0.recon.wav"), tone, sr)
    for n in (0, 100):
        save_wav(str(task / f"u0.step_last-FTstep_{n}.synth.wav"), tone, sr)

    out = tmp_path / "out"
    rows = ev.mos_rows(str(tmp_path / "real"), str(res), "step_last",
                       max_per_speaker=4, out_dir=str(out))
    labels = dict(rows)
    for want in ("mos_spectral_proxy_real", "mos_spectral_proxy_recon",
                 "mos_spectral_proxy_synth_step0",
                 "mos_spectral_proxy_synth_step100"):
        assert want in labels, (want, sorted(labels))
        mean_str, ci_str = labels[want].split(" ±")
        assert 1.0 <= float(mean_str) <= 5.0 and float(ci_str) >= 0.0
    assert (out / "mos.png").exists()
    # grouped bar chart across modes (reference compute_mos.py bar_plot)
    assert (out / "mos_bar.png").exists()


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"w": jnp.ones((3, 4))}, "b": jnp.zeros((2,))}
    state = {"s": jnp.full((2,), 7.0)}
    opt = {"count": jnp.zeros((), jnp.int32)}
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, params, state, opt, 123)
    p2, s2, o2, step, rep = load_checkpoint(path, params, state, opt)
    assert step == 123 and rep == []
    np.testing.assert_allclose(np.asarray(p2["a"]["w"]), 1.0)


def test_checkpoint_speaker_table_surgery(tmp_path):
    # save with 4 speakers, load into 8-speaker model
    small = {"speaker_emb": {"table": jnp.arange(4 * 3, dtype=jnp.float32)
                             .reshape(4, 3)}}
    path = str(tmp_path / "s.ckpt")
    save_checkpoint(path, small, {}, {}, 5)
    big = {"speaker_emb": {"table": jnp.full((8, 3), -1.0)}}
    p2, _, opt2, step, rep = load_checkpoint(path, big, {}, {})
    assert opt2 is None               # optimizer discarded after surgery
    assert any("resized" in r for r in rep)
    t = np.asarray(p2["speaker_emb"]["table"])
    np.testing.assert_allclose(t[:4].ravel(), np.arange(12))
    np.testing.assert_allclose(t[4:], -1.0)


def test_average_speaker_rows():
    params = {"speaker_emb": {"table": jnp.asarray(
        [[1.0, 1.0], [3.0, 3.0], [10.0, 10.0]])}}
    out = average_speaker_rows(params, train_rows=[0, 1])
    np.testing.assert_allclose(np.asarray(out["speaker_emb"]["table"]),
                               2.0)


def test_noam_schedule_shape():
    lr = noam_schedule(256, 4000, [300000], 0.3)
    v1, v4k, v10k = (float(lr(jnp.asarray(s))) for s in (1, 4000, 10000))
    assert v1 < v4k                       # warmup rises
    assert v10k < v4k                     # inverse-sqrt decays
    v300k, v300k1 = (float(lr(jnp.asarray(s))) for s in (299999, 300001))
    np.testing.assert_allclose(v300k1 / v300k, 0.3, rtol=0.01)


def test_noam_schedule_empty_anneal_steps():
    """anneal_steps: [] must mean 'never anneal', not 'anneal from step 0'."""
    plain = noam_schedule(256, 4000, [], 0.3)
    never = noam_schedule(256, 4000, [10 ** 9], 0.3)
    for s in (1, 4000, 50000):
        np.testing.assert_allclose(float(plain(jnp.asarray(s))),
                                   float(never(jnp.asarray(s))), rtol=1e-6)


def test_det_roc_plots(tmp_path):
    """DET/ROC figures consume speaker_verification_eer's fpr/fnr arrays
    (reference evaluation/speaker_verification.py:20)."""
    from metatts_tpu.evaluation.verification import speaker_verification_eer
    from metatts_tpu.evaluation.visualize import det_plot, roc_plot
    rng = np.random.RandomState(0)
    res = speaker_verification_eer(rng.rand(50) * 0.5 + 0.5,
                                   rng.rand(80) * 0.6)
    d = det_plot({"real": res}, str(tmp_path / "det.png"))
    r = roc_plot({"real": res}, str(tmp_path / "roc.png"))
    import os
    assert os.path.getsize(d) > 0 and os.path.getsize(r) > 0


def test_eer_degenerate_inputs_return_nan():
    """Single-task smoke runs can yield no same- or diff-speaker pairs; the
    metric must degrade to NaN (with a warning), not crash."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r1 = speaker_verification_eer(np.zeros(0), np.ones(5))
        r2 = speaker_verification_eer(np.ones(5), np.zeros(0))
    assert np.isnan(r1["eer"]) and np.isnan(r2["auc"])
    from metatts_tpu.evaluation.visualize import det_plot, roc_plot
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        det_plot({"x": r1}, os.path.join(d, "det.png"))
        roc_plot({"x": r1}, os.path.join(d, "roc.png"))


def test_similarity_values_and_step_plot(tmp_path):
    """Per-utterance centroid-similarity distribution + the errorbar
    similarity-vs-adaptation-step figure (reference
    evaluation/similarity_plot.py errorbar_plot)."""
    from metatts_tpu.evaluation.harness import EvaluationHarness
    from metatts_tpu.evaluation.visualize import similarity_step_plot
    rng = np.random.RandomState(1)
    enroll = {"7": rng.randn(4, 8), "9": rng.randn(4, 8)}
    test = {"LibriTTS_en-spk_7": rng.randn(3, 8),
            "9": rng.randn(2, 8),
            "unmatched-spk_11": rng.randn(2, 8)}
    vals = EvaluationHarness.similarity_values(enroll, test)
    assert vals.shape == (5,)                 # 3 + 2; unmatched dropped
    assert np.all(np.abs(vals) <= 1.0 + 1e-6)

    p = similarity_step_plot(
        {"meta_emb_vad": [(0, 0.2, 0.05), (10, 0.5, 0.04), (100, 0.7, 0.03)],
         "base_emb_vad": [(0, 0.2, 0.05), (100, 0.4, 0.06)]},
        {"recon": (0.8, 0.02), "real": (0.9, 0.01)},
        str(tmp_path / "sim.png"))
    import os
    assert os.path.getsize(p) > 0


def test_run_matrix_per_mode_ft_steps(tmp_path):
    """modes entries may be {dir, ft_step_list} (reference config.py
    mode_step_list pairs — e.g. 1-shot modes evaluate out to step 1000);
    plain string entries keep the global ft_step_list."""
    import sys
    import types
    import yaml
    import evaluate as ev
    from metatts_tpu.preprocess.audio_io import save_wav

    sr = 22050
    rng = np.random.RandomState(0)

    def tone(f):
        t = np.arange(sr // 4) / sr
        return (0.4 * np.sin(2 * np.pi * f * t)
                + 0.01 * rng.randn(t.size)).astype(np.float32)

    for spk, f in (("s1", 200), ("s2", 500)):
        d = tmp_path / "real" / spk
        d.mkdir(parents=True)
        for i in range(2):
            save_wav(str(d / f"u{i}.wav"), tone(f), sr)

    res = tmp_path / "result"
    for tid, f in (("test_000", 210), ("test_001", 510)):
        task = res / "audio" / "Testing" / "step_last" / tid
        task.mkdir(parents=True)
        save_wav(str(task / "u0.recon.wav"), tone(f), sr)
        for n in (0, 7):
            save_wav(str(task / f"u0.step_last-FTstep_{n}.synth.wav"),
                     tone(f), sr)

    cfg = {"corpus": "T", "real_dir": str(tmp_path / "real"), "n_sample": 4,
           "step_list": ["step_last"], "ft_step_list": [0],
           "modes": {"m_global": str(res),
                     "m_custom": {"dir": str(res), "ft_step_list": [7]}}}
    cfg_path = tmp_path / "matrix.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    args = types.SimpleNamespace(
        config=str(cfg_path), out=str(tmp_path / "out"),
        dvector_weights=None, mosnet_weights=None, mbnet_weights=None,
        mos=False)
    ev.run_matrix(args)
    report = (tmp_path / "out" / "eer.txt").read_text()
    assert "m_global_synth_step_last_FTstep0" in report
    assert "m_global_synth_step_last_FTstep7" not in report
    assert "m_custom_synth_step_last_FTstep7" in report
    assert "m_custom_synth_step_last_FTstep0" not in report


def test_tsne_mode_plot(tmp_path):
    """Cross-mode t-SNE (reference visualize.py figure): joint embedding,
    hue = mode, marker = speaker; keys matched by the '-spk_' suffix."""
    from metatts_tpu.evaluation.visualize import tsne_mode_plot
    rng = np.random.RandomState(0)
    real = {"7": rng.randn(8, 16) + 3, "9": rng.randn(8, 16) - 3}
    synth = {"L_en-spk_7": rng.randn(8, 16) + 2.5,
             "L_en-spk_9": rng.randn(8, 16) - 2.5}
    out = tmp_path / "tsne_modes.png"
    path = tsne_mode_plot({"real": real, "meta_step10": synth}, str(out))
    assert path and out.exists() and out.stat().st_size > 0
    # single mode -> no figure (degenerate)
    assert tsne_mode_plot({"real": real}, str(tmp_path / "x.png")) is None
