"""CLI drives for the train / debug / predict stages (reference
``main.py:142-196`` surface; the test stage is CLI-driven in
tests/test_weights_drop.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_train_debug_predict(tmp_path):
    from test_weights_drop import _build_corpus

    tmp = str(tmp_path)
    pcfg, raw_dir, pre_dir = _build_corpus(tmp)

    cfg_dir = os.path.join(tmp, "config")
    os.makedirs(cfg_dir, exist_ok=True)
    p_yaml = os.path.join(cfg_dir, "preprocess.yaml")
    yaml.safe_dump(pcfg, open(p_yaml, "w"))
    m_yaml = os.path.join(cfg_dir, "model.yaml")
    yaml.safe_dump({
        "transformer": {"encoder_layer": 1, "decoder_layer": 1,
                        "encoder_hidden": 64, "decoder_hidden": 64,
                        "conv_filter_size": 64},
        "compute_dtype": "float32",
        "activation_dtype": "float32",
        "max_seq_len": 128,
    }, open(m_yaml, "w"))
    t_yaml = os.path.join(cfg_dir, "train.yaml")
    yaml.safe_dump({"step": {"total_step": 2, "log_step": 1,
                             "synth_step": 0, "val_step": 2,
                             "save_step": 2}}, open(t_yaml, "w"))
    a_yaml = os.path.join(cfg_dir, "algorithm.yaml")
    yaml.safe_dump({
        "name": "cli", "type": "meta",
        "adapt": {
            "type": "spk", "speaker_emb": "table",
            "modules": ["speaker_emb", "variance_adaptor", "decoder",
                        "mel_linear", "postnet"],
            "train": {"ways": 1, "shots": 2, "queries": 2, "lr": 0.001,
                      "steps": 1, "meta_batch_size": 1},
            "test": {"ways": 1, "shots": 2, "queries": 1, "lr": 0.001,
                     "steps": 2, "saving_steps": [2]},
        },
    }, open(a_yaml, "w"))

    out_dir = os.path.join(tmp, "output")
    env = {**os.environ, "METATTS_PLATFORM": "cpu",
           "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")}
    base = [sys.executable, os.path.join(REPO, "main.py"),
            "-p", p_yaml, "-m", m_yaml, "-t", t_yaml, "-a", a_yaml,
            "-e", "cli", "--output_dir", out_dir]

    r = subprocess.run(base + ["-s", "debug"], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "debug: iterated" in r.stdout

    r = subprocess.run(base + ["-s", "train", "--max_steps", "2",
                               "--no_synth"],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = os.path.join(out_dir, "ckpt", "cli", "last.ckpt")
    assert os.path.exists(ckpt)

    # reference TextDataset line format: basename|speaker|text|raw_text
    src = os.path.join(tmp, "sentences.txt")
    open(src, "w").write(
        "utt_a|spk_a|hello world|hello world\n"
        "utt_b|spk_b|this is a test|this is a test\n")
    r = subprocess.run(base + ["-s", "predict", "--source", src,
                               "-c", ckpt],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    pred_dir = os.path.join(out_dir, "result", "cli", "audio", "Prediction",
                            "step_last", "predict")
    wavs = [f for f in os.listdir(pred_dir) if f.endswith(".wav")]
    assert len(wavs) == 2, wavs
