"""Multi-corpus behavior: cross-corpus stats sharing (reference
``preprocessor.py:117-143``) and ConcatDataset episode labels
(``datamodules/utils.py:133-142``)."""

import json
import os

import numpy as np
import pytest

from metatts_tpu import config as C
from metatts_tpu.preprocess.preprocessor import Preprocessor
from metatts_tpu.preprocess.audio_io import save_wav
from metatts_tpu.data import TTSDataset
from metatts_tpu.data.datamodule import ConcatDataset

SR = 22050


def _make_corpus(root, name, speakers, f0s, n_utts=3):
    from test_preprocess import _write_textgrid
    phones = ["HH", "AH0", "L", "OW1"]
    raw = os.path.join(root, name, "raw")
    out = os.path.join(root, name, "pre")
    rng = np.random.RandomState(0)
    for spk, f0 in zip(speakers, f0s):
        for u in range(n_utts):
            dur = 0.1 * len(phones) + 0.05
            t = np.arange(int(SR * dur)) / SR
            wav = 0.4 * np.sin(2 * np.pi * f0 * np.cumsum(
                1 + 0.03 * np.sin(2 * np.pi * t)) / SR * SR * 0 + 2 * np.pi * f0 * t)
            wav = wav + 0.01 * rng.randn(len(t))
            d = os.path.join(raw, "train", spk)
            os.makedirs(d, exist_ok=True)
            save_wav(os.path.join(d, f"{spk}_u{u}.wav"),
                     wav.astype(np.float32), SR)
            open(os.path.join(d, f"{spk}_u{u}.lab"), "w").write("hello")
            _write_textgrid(os.path.join(out, "TextGrid", spk,
                                         f"{spk}_u{u}.TextGrid"), phones)
    cfg = C.deep_merge(C.PREPROCESS_DEFAULTS, {
        "dataset": name, "lang_id": 0,
        "path": {"raw_path": raw, "preprocessed_path": out},
        "subsets": {"train": "train", "val": "train", "test": "train"},
    })
    return cfg


def test_cross_corpus_stats_sharing(tmp_path):
    root = str(tmp_path)
    cfg_a = _make_corpus(root, "corpusA", ["a1", "a2"], [120, 150])
    cfg_b = _make_corpus(root, "corpusB", ["b1"], [240])

    Preprocessor(cfg_a).build_from_path()
    stats_a = json.load(open(os.path.join(
        cfg_a["path"]["preprocessed_path"], "stats.json")))

    # second corpus reuses corpus A's stats when pointed at the same
    # preprocessed dir tree (reference: existing stats.json wins)
    import shutil
    shutil.copy(os.path.join(cfg_a["path"]["preprocessed_path"],
                             "stats.json"),
                os.path.join(cfg_b["path"]["preprocessed_path"],
                             "stats.json"))
    Preprocessor(cfg_b).build_from_path()
    stats_b = json.load(open(os.path.join(
        cfg_b["path"]["preprocessed_path"], "stats.json")))
    assert stats_b["pitch"][2] == stats_a["pitch"][2]   # mean shared
    assert stats_b["pitch"][3] == stats_a["pitch"][3]   # std shared
    # corpus B's pitch z-scores under A's stats sit above A's mean
    ds_b = TTSDataset("train.txt", cfg_b)
    z = np.concatenate([ds_b[i]["pitch"] for i in range(len(ds_b))])
    assert z.mean() > 0.5   # 240Hz vs ~135Hz mean


def test_concat_dataset_labels(tmp_path):
    root = str(tmp_path)
    cfg_a = _make_corpus(root, "corpusA", ["a1"], [120])
    cfg_b = _make_corpus(root, "corpusB", ["b1"], [240])
    Preprocessor(cfg_a).build_from_path()
    Preprocessor(cfg_b).build_from_path()
    ds = ConcatDataset([TTSDataset("train.txt", cfg_a),
                        TTSDataset("train.txt", cfg_b)])
    labels = {ds.speaker_label(i) for i in range(len(ds))}
    assert labels == {"corpusA_0-spk_a1", "corpusB_0-spk_b1"}
    assert len(ds) == 6
    # indexing crosses the corpus boundary correctly
    assert ds[0]["id"].startswith("a1_")
    assert ds[3]["id"].startswith("b1_")
