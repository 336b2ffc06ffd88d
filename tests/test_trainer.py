"""Trainer loop integration at tiny scale with a stub datamodule —
regression net for fit/validate/test orchestration (the CLI drives cover
behavior; this covers the loop without the CLI)."""

import os

import numpy as np
import pytest

from metatts_tpu.algorithms import get_system
from metatts_tpu.train.loop import Trainer
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     algorithm_cfg, synth_batch, STATS)


class StubMetaDM:
    """Minimal datamodule: synthetic episodes, two frozen val/test tasks."""

    def __init__(self, rng=None):
        self.rng = rng or np.random.RandomState(0)

    def _episode_samples(self, n):
        out = []
        for i in range(n):
            d = self.rng.randint(1, 4, size=(10,)).astype(np.int32)
            T = int(d.sum())
            out.append({
                "id": f"u{i}",
                "speaker": int(self.rng.randint(0, 4)),
                "text": self.rng.randint(1, 360, size=(10,)).astype(np.int32),
                "raw_text": "stub",
                "mel": self.rng.randn(T, 8).astype(np.float32),
                "pitch": self.rng.randn(10).astype(np.float32),
                "energy": self.rng.randn(10).astype(np.float32),
                "duration": d,
            })
        return out

    def train_episode_batches(self, meta_batch_size):
        from metatts_tpu.data.collate import collate_episode
        while True:
            sups = [self._episode_samples(2) for _ in range(meta_batch_size)]
            qrys = [self._episode_samples(2) for _ in range(meta_batch_size)]
            yield collate_episode(sups, qrys, max_seq_len=64)

    def val_episodes(self):
        for _ in range(2):
            yield {"label": "stub"}, (self._episode_samples(2),
                                      self._episode_samples(2))

    def test_episodes(self):
        yield from self.val_episodes()


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tcfg = tiny_train_cfg()
    tcfg["step"].update(total_step=4, log_step=2, val_step=4, save_step=4,
                        synth_step=10 ** 9)
    system = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                tcfg, algorithm_cfg("meta"), stats=STATS,
                                n_speakers=4)
    out = str(tmp_path_factory.mktemp("trainer_out"))
    return Trainer(system, StubMetaDM(), tcfg, output_dir=out,
                   exp_name="stub"), out


def test_fit_trains_logs_checkpoints(trainer):
    tr, out = trainer
    tr.fit(max_steps=4)
    assert tr.system.global_step == 4
    assert os.path.exists(os.path.join(out, "ckpt", "stub", "last.ckpt"))
    train_csv = os.path.join(out, "log", "stub", "train.csv")
    assert os.path.exists(train_csv)
    events = os.path.join(out, "log", "stub", "events.jsonl")
    assert os.path.getsize(events) > 0
    # validation CSVs were written at val_step
    val_dir = os.path.join(out, "result", "stub", "csv", "Validation",
                           "step_last")
    assert len(os.listdir(val_dir)) == 2


def test_test_stage_writes_task_csvs(trainer):
    tr, out = trainer
    results = tr.test(max_tasks=1)
    assert "test_000" in results
    steps = [s for s, _ in results["test_000"]]
    assert steps[0] == 0 and steps[-1] <= 10
    csv_dir = os.path.join(out, "result", "stub", "csv", "Testing",
                           "step_last")
    assert os.path.exists(os.path.join(csv_dir, "test_000.csv"))


def test_fit_resume_roundtrip(trainer):
    tr, out = trainer
    ckpt = os.path.join(out, "ckpt", "stub", "last.ckpt")
    tr.system.global_step = 0
    tr.fit(resume_from=ckpt, max_steps=6)
    assert tr.system.global_step == 6


class StubVocoder:
    """Vocoder seam: Trainer only calls .infer(mels, lengths)."""

    def infer(self, mels, lengths=None):
        import numpy as np
        mels = np.asarray(mels)
        out = []
        for i in range(mels.shape[0]):
            n = int(lengths[i]) if lengths is not None else mels.shape[1] * 4
            out.append(np.zeros(max(n, 1), np.int16))
        return out


def test_validation_first_batch_audio_and_figure(tmp_path):
    """The reference Saver writes reconstruction + prediction audio and a
    synthesized-vs-ground-truth spectrogram figure for the FIRST validation
    batch only (saver.py:96-105 via synth_one_sample_with_target)."""
    tcfg = tiny_train_cfg()
    system = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                tcfg, algorithm_cfg("meta"), stats=STATS,
                                n_speakers=4)
    out = str(tmp_path)
    tr = Trainer(system, StubMetaDM(), tcfg, output_dir=out,
                 exp_name="val", vocoder=StubVocoder())
    tr.validate(step=2)
    audio_dir = os.path.join(out, "result", "val", "audio", "Validation",
                             "step_last", "step_2")
    names = sorted(os.listdir(audio_dir))
    assert "sample.reconstructed.wav" in names
    assert "sample.synthesized.wav" in names
    fig_dir = os.path.join(out, "result", "val", "figure", "Validation",
                           "step_last", "step_2")
    figs = os.listdir(fig_dir)
    assert any(n.startswith("sample.") for n in figs)
    # only the first batch gets audio/figure (two val episodes in the stub)
    assert len(names) == 2


@pytest.mark.parametrize("alg", ["meta", "baseline", "imaml"])
def test_test_stage_all_systems_with_per_step_audio(alg, tmp_path):
    """The test stage is shared by all three systems (reference
    base_adaptor.py:136-189) and writes synth audio at EVERY adaptation
    saving step (reference saver.py:130-194) — the EER-vs-steps input."""
    tcfg = tiny_train_cfg()
    system = get_system(alg)(tiny_preprocess_cfg(), tiny_model_cfg(),
                             tcfg, algorithm_cfg(alg), stats=STATS,
                             n_speakers=4)
    out = str(tmp_path)
    tr = Trainer(system, StubMetaDM(), tcfg, output_dir=out,
                 exp_name=alg, vocoder=StubVocoder())
    results = tr.test(max_tasks=1)
    assert "test_000" in results
    audio_dir = os.path.join(out, "result", alg, "audio", "Testing",
                             "step_last", "test_000")
    names = sorted(os.listdir(audio_dir))
    assert any(n.endswith(".recon.wav") for n in names)
    for ft in (0, 5, 10):
        assert any(f"-FTstep_{ft}.synth.wav" in n for n in names), \
            f"{alg}: missing synth audio at adaptation step {ft}: {names}"
    # per-saving-step spectrogram figures alongside the audio (reference
    # test figure tree, saver.py:130-194)
    fig_dir = os.path.join(out, "result", alg, "figure", "Testing",
                           "step_last", "test_000")
    figs = sorted(os.listdir(fig_dir))
    assert any(".recon." in n for n in figs)
    for ft in (0, 5, 10):
        assert any(f"-FTstep_{ft}.synth" in n for n in figs), \
            f"{alg}: missing figure at adaptation step {ft}: {figs}"


def test_test_stage_batched_tasks(tmp_path):
    """task_batch=2 adapts both stub episodes in ONE vmapped trajectory
    (System.test_adapt_batched) and writes the same per-task artifact set
    as the sequential path — CSVs, per-FTstep synth wavs, recon wav."""
    tcfg = tiny_train_cfg()
    tcfg["step"].update(total_step=2, log_step=2, val_step=10 ** 9,
                        save_step=10 ** 9, synth_step=10 ** 9)
    system = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                tcfg, algorithm_cfg("meta"), stats=STATS,
                                n_speakers=4)
    out = str(tmp_path)
    tr = Trainer(system, StubMetaDM(), tcfg, output_dir=out,
                 exp_name="stub", vocoder=StubVocoder())
    results = tr.test(task_batch=2)
    assert set(results) == {"test_000", "test_001"}
    for tid in results:
        steps = [s for s, _ in results[tid]]
        assert steps == [0, 5, 10]
        assert all(np.isfinite(float(v.total)) for _, v in results[tid])
        csv = os.path.join(out, "result", "stub", "csv", "Testing",
                           "step_last", f"{tid}.csv")
        assert os.path.exists(csv)
        audio = os.path.join(out, "result", "stub", "audio", "Testing",
                             "step_last", tid)
        names = os.listdir(audio)
        assert any(n.endswith(".recon.wav") for n in names)
        for ft in (0, 5, 10):
            assert any(n.endswith(f"FTstep_{ft}.synth.wav")
                       for n in names), (tid, ft, names)


def test_fit_profiles_step_times(tmp_path, capsys):
    """train.profile 'simple' (the reference's always-on Lightning
    profiler) logs per-step wall stats to the metrics stream and prints a
    final summary."""
    import json
    tcfg = tiny_train_cfg()
    tcfg["step"].update(total_step=3, log_step=2, val_step=10 ** 9,
                        save_step=10 ** 9, synth_step=10 ** 9)
    system = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                tcfg, algorithm_cfg("meta"), stats=STATS,
                                n_speakers=4)
    tr = Trainer(system, StubMetaDM(), tcfg, output_dir=str(tmp_path),
                 exp_name="prof")
    tr.fit(max_steps=3)
    out = capsys.readouterr().out
    assert "[profile]" in out and "p95" in out
    events = os.path.join(str(tmp_path), "log", "prof", "events.jsonl")
    recs = [json.loads(l) for l in open(events)]
    assert any("profile/step_mean_ms" in r.get("metrics", {}) or
               "profile/step_mean_ms" in r for r in recs), recs[:3]


def test_validate_batched_matches_artifacts(tmp_path):
    """Batched validation (task_batch=2) writes the same per-task CSVs and
    the first-batch audio/figure as the sequential path."""
    tcfg = tiny_train_cfg()
    tcfg["step"].update(total_step=2, log_step=2, val_step=10 ** 9,
                        save_step=10 ** 9, synth_step=10 ** 9)
    system = get_system("meta")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                tcfg, algorithm_cfg("meta"), stats=STATS,
                                n_speakers=4)
    tr = Trainer(system, StubMetaDM(), tcfg, output_dir=str(tmp_path),
                 exp_name="stub", vocoder=StubVocoder())
    totals = tr.validate(step=2, task_batch=2)
    assert len(totals) == 2
    assert all(np.isfinite(t[0]) for t in totals)
    csv_dir = os.path.join(str(tmp_path), "result", "stub", "csv",
                           "Validation", "step_last")
    assert sorted(os.listdir(csv_dir)) == ["val_000.csv", "val_001.csv"]
    audio_dir = os.path.join(str(tmp_path), "result", "stub", "audio",
                             "Validation", "step_last", "step_2")
    assert any(n.endswith(".wav") for n in os.listdir(audio_dir))
