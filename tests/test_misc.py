import json
import os

import numpy as np

from metatts_tpu.utils.rng import seed_all, seed_everything
from metatts_tpu.train.logging import ExperimentLogger
from metatts_tpu.train.saver import Saver
from metatts_tpu.data.lang_episodes import (episode_phoneme_representation,
                                            split_disjoint_phonemes)
from metatts_tpu.evaluation.mos import score, available_scorers
from metatts_tpu.models.loss import LossValues


def test_seed_all_restores_state():
    np.random.seed(7)
    before = np.random.rand()
    np.random.seed(7)
    with seed_all(43):
        inner1 = np.random.rand()
    after = np.random.rand()
    with seed_all(43):
        inner2 = np.random.rand()
    assert inner1 == inner2          # frozen seed reproducible
    assert before == after           # outer stream untouched


def test_experiment_logger_jsonl(tmp_path):
    lg = ExperimentLogger(str(tmp_path), "t")
    lg.log_hyperparams({"model": {"a": 1}})
    lg.log_metrics(5, {"train/total": 1.5})
    lg.log_artifact(5, "audio", "/x.wav")
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["hyperparams", "metrics", "artifact"]
    assert lines[1]["metrics"]["train/total"] == 1.5


def test_saver_task_csv(tmp_path):
    s = Saver(str(tmp_path / "log"), str(tmp_path / "res"))
    rows = [(0, LossValues(*[np.float32(i) for i in range(6)])),
            (5, LossValues(*[np.float32(i + 1) for i in range(6)]))]
    path = s.log_task_csv("Testing", "test_000", rows)
    content = open(path).read().splitlines()
    assert content[0].startswith("ft_step,total,mel")
    assert content[1].startswith("0,0.0")
    assert content[2].startswith("5,1.0")


def test_episode_phoneme_representation():
    samples = [
        {"text": np.array([3, 4, 3]), "representation":
            np.array([[1., 0.], [0., 2.], [3., 0.]])},
        {"text": np.array([4]), "representation": np.array([[0., 4.]])},
    ]
    rep = episode_phoneme_representation(samples)
    assert rep.shape[1] == 2
    np.testing.assert_allclose(rep[3], [2.0, 0.0])   # mean of (1,0),(3,0)
    np.testing.assert_allclose(rep[4], [0.0, 3.0])   # mean of (0,2),(0,4)
    np.testing.assert_allclose(rep[0], 0.0)          # PAD row
    np.testing.assert_allclose(rep[7], 0.0)          # absent phoneme


def test_split_disjoint_phonemes():
    sup = [{"text": np.array([1, 2, 3])}]
    qry = [{"text": np.array([2, 3, 4])}]
    rng = np.random.RandomState(0)
    sup_masks, qry_masks = split_disjoint_phonemes(sup, qry, rng)
    kept_sup = set(sup[0]["text"][sup_masks[0]].tolist())
    kept_qry = set(qry[0]["text"][qry_masks[0]].tolist())
    assert not (kept_sup & kept_qry & {2, 3})  # shared phones disjoint


def test_mos_proxy_orders_tone_above_noise():
    assert "spectral_proxy" in available_scorers()
    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 220 * t)
    noise = np.random.RandomState(0).randn(sr) * 0.3
    assert score("spectral_proxy", tone, sr) > score("spectral_proxy",
                                                     noise, sr)
    try:
        score("mosnet", tone, sr)
        assert False, "mosnet should be unavailable"
    except KeyError:
        pass


def test_prefetcher_order_and_errors():
    from metatts_tpu.data.prefetch import Prefetcher

    pf = Prefetcher(iter(range(5)), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]

    def bad():
        yield 1
        raise RuntimeError("boom")

    pf = Prefetcher(bad())
    assert next(pf) == 1
    try:
        next(pf)
        assert False
    except RuntimeError as e:
        assert "boom" in str(e)


def test_split_batch():
    import jax.numpy as jnp
    from metatts_tpu.data.collate import split_batch
    from metatts_tpu.models.fastspeech2 import Batch
    b = Batch(speaker_args=jnp.arange(4),
              texts=jnp.arange(12).reshape(4, 3),
              src_lens=jnp.full((4,), 3))
    s = split_batch(b, [2, 0])
    assert s.texts.shape == (2, 3)
    assert int(s.speaker_args[0]) == 2 and int(s.speaker_args[1]) == 0
