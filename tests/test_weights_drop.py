"""End-to-end pretrained-weights file-drop path through the CLIs.

The reference's output story rests on external pretrained weights:
torch.hub MelGAN (``lightning/utils.py:10-13``) and resemblyzer GE2E
(``evaluation/wavs_to_dvector.py:18``).  Real checkpoints are environment-
blocked here, but the drop path must be CLI-complete: this test fabricates
state dicts in the OFFICIAL layouts, converts them with
``tools/convert_torch_weights.py``, then drives ``main.py -s test`` with
``model.vocoder.weights_npz`` set and ``evaluate.py --dvector-weights`` on
the artifacts — asserting the UNCALIBRATED/random-init tags disappear and
the artifact tree is consumed.  When real weights arrive they take exactly
this path.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)


def _fabricate_weights(tmp):
    """Official-layout MelGAN + GE2E npz files (the converters' input
    schemas are asserted in tests/test_vocoder_schema.py)."""
    from test_vocoder_schema import _torch_melgan
    from convert_torch_weights import convert_melgan, convert_ge2e

    torch.manual_seed(7)
    g = _torch_melgan().eval()
    melgan_pt = os.path.join(tmp, "melgan.pt")
    melgan_npz = os.path.join(tmp, "melgan.npz")
    torch.save(g.state_dict(), melgan_pt)
    convert_melgan(melgan_pt, melgan_npz)

    lstm = torch.nn.LSTM(40, 256, 3, batch_first=True)
    lin = torch.nn.Linear(256, 256)
    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"linear.{k}": v for k, v in lin.state_dict().items()})
    ge2e_pt = os.path.join(tmp, "ge2e.pt")
    ge2e_npz = os.path.join(tmp, "ge2e.npz")
    torch.save(sd, ge2e_pt)
    convert_ge2e(ge2e_pt, ge2e_npz)
    return melgan_npz, ge2e_npz


def _build_corpus(root):
    from test_preprocess import _write_textgrid, SR
    from metatts_tpu.preprocess.audio_io import save_wav
    from metatts_tpu.preprocess.preprocessor import Preprocessor
    from metatts_tpu import config as C

    raw = os.path.join(root, "raw_data")
    out = os.path.join(root, "preprocessed")
    phones = ["HH", "AH0", "sp", "L", "OW1"]
    rng = np.random.RandomState(0)
    for spk, f0 in [("spk_a", 120.0), ("spk_b", 220.0)]:
        for u in range(4):
            base = f"{spk}_utt{u}"
            t = np.arange(int(SR * 0.7)) / SR
            f = f0 * (1 + 0.05 * np.sin(2 * np.pi * (u + 1) * t))
            wav = (0.4 * np.sin(2 * np.pi * np.cumsum(f) / SR)
                   + 0.01 * rng.randn(len(t)))
            d = os.path.join(raw, "train", spk)
            os.makedirs(d, exist_ok=True)
            save_wav(os.path.join(d, f"{base}.wav"),
                     wav.astype(np.float32), SR)
            open(os.path.join(d, f"{base}.lab"), "w").write("hello")
            _write_textgrid(os.path.join(out, "TextGrid", spk,
                                         f"{base}.TextGrid"), phones)
    cfg = C.deep_merge(C.PREPROCESS_DEFAULTS, {
        "dataset": "synth",
        "path": {"raw_path": raw, "preprocessed_path": out},
        "subsets": {"train": "train", "val": "train", "test": "train"},
    })
    Preprocessor(cfg).build_from_path()
    return cfg, raw, out


@pytest.mark.slow
def test_weights_drop_cli_end_to_end(tmp_path):
    tmp = str(tmp_path)
    melgan_npz, ge2e_npz = _fabricate_weights(tmp)
    pcfg, raw_dir, pre_dir = _build_corpus(tmp)

    # --- config files for the CLI (the file-drop user journey) ----------
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
        "vocoder": {"model": "MelGAN", "speaker": "universal",
                    "weights_npz": melgan_npz},
    }, open(m_yaml, "w"))
    t_yaml = os.path.join(cfg_dir, "train.yaml")
    yaml.safe_dump({"step": {"total_step": 2, "log_step": 1,
                             "synth_step": 0, "val_step": 10,
                             "save_step": 10}},
                   open(t_yaml, "w"))
    a_yaml = os.path.join(cfg_dir, "algorithm.yaml")
    yaml.safe_dump({
        "name": "drop", "type": "meta",
        "adapt": {
            "type": "spk", "speaker_emb": "table",
            "modules": ["speaker_emb", "variance_adaptor", "decoder",
                        "mel_linear", "postnet"],
            "train": {"ways": 1, "shots": 2, "queries": 2, "lr": 0.001,
                      "steps": 2, "meta_batch_size": 2},
            "test": {"ways": 1, "shots": 2, "queries": 1, "lr": 0.001,
                     "steps": 5, "saving_steps": [5]},
        },
    }, open(a_yaml, "w"))

    out_dir = os.path.join(tmp, "output")
    env = {**os.environ, "METATTS_PLATFORM": "cpu",
           "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "-s", "test",
         "-p", p_yaml, "-m", m_yaml, "-t", t_yaml, "-a", a_yaml,
         "-e", "drop", "--output_dir", out_dir,
         "--max_tasks", "2", "--tasks_per_label", "1"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    # pretrained vocoder accepted: no random-init warning anywhere
    assert "random-init" not in r.stderr and "random-init" not in r.stdout
    result_dir = os.path.join(out_dir, "result", "drop")
    wavs = []
    for root, _, files in os.walk(os.path.join(result_dir, "audio")):
        wavs += [os.path.join(root, f) for f in files
                 if f.endswith(".wav")]
    assert any(f.endswith(".recon.wav") for f in wavs)
    assert any("-FTstep_5.synth.wav" in f for f in wavs)

    # --- evaluate.py consumes the tree with the dropped GE2E weights ----
    eval_out = os.path.join(tmp, "eval_out")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "evaluate.py"),
         "--real", os.path.join(raw_dir, "train"),
         "--result", result_dir, "--dvector-weights", ge2e_npz,
         "--out", eval_out, "--max-per-speaker", "4"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-3000:]
    report = open(os.path.join(eval_out, "eer.txt")).read()
    assert "UNCALIBRATED" not in report
    assert "real_eer" in report
    # per-adaptation-step synth rows are evaluated separately by default
    assert "FTstep5" in report or "FTstep" in report
