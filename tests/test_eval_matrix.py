"""The full 31-mode evaluation matrix (reference evaluation/config.py:72-138
mode_list + mode_step_list) as shipped in config/evaluation/*.yaml, and a
multi-mode run_matrix drive over a fabricated result tree."""

import json
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's mode_step_list (evaluation/config.py:104-138), keyed by
# mode name with its step list
REFERENCE_MODE_STEPS = {
    **{m: [0, 5, 10, 20, 50, 100] for m in [
        "base_emb_vad", "base_emb_va", "base_emb_d", "base_emb",
        "meta_emb_vad", "meta_emb_va", "meta_emb_d", "meta_emb",
        "base_emb1_vad", "base_emb1_va", "base_emb1_d", "base_emb1",
        "meta_emb1_vad", "meta_emb1_va", "meta_emb1_d", "meta_emb1",
        "base_emb_vad-train_clean", "base_emb_vad-train_all",
        "meta_emb_vad-train_clean", "meta_emb_vad-train_all",
        "base_emb_vad-avg_train_spk_emb",
        "base_emb_vad-train_clean-avg_train_spk_emb",
        "base_emb_vad-train_all-avg_train_spk_emb",
        "meta_emb_vad-avg_train_spk_emb",
        "meta_emb_vad-train_clean-avg_train_spk_emb",
        "meta_emb_vad-train_all-avg_train_spk_emb",
    ]},
    "scratch_encoder": [0], "encoder": [0], "dvec": [0],
    "base_emb_vad-1_shot": [0, 5, 10, 20, 50, 100, 200, 400, 600, 800, 1000],
    "meta_emb_vad-1_shot": [0, 5, 10, 20, 50, 100, 200, 400, 600, 800, 1000],
}

# eval-matrix mode name -> shipped algorithm yaml, where they differ (the
# train-subset suffix picks -p/-t configs; "encoder" is the trainable
# speaker-encoder system this repo ships as meta_encoder.yaml)
MODE_TO_ALGORITHM = {"encoder": "meta_encoder"}


@pytest.mark.parametrize("corpus", ["LibriTTS", "VCTK"])
def test_matrix_yaml_encodes_reference_grid(corpus):
    cfg = yaml.safe_load(open(
        os.path.join(REPO, "config", "evaluation", f"{corpus}.yaml")))
    modes = cfg["modes"]
    assert set(modes) == set(REFERENCE_MODE_STEPS), (
        set(modes) ^ set(REFERENCE_MODE_STEPS))
    global_steps = cfg["ft_step_list"]
    for mode, steps in REFERENCE_MODE_STEPS.items():
        entry = modes[mode]
        got = (entry.get("ft_step_list", global_steps)
               if isinstance(entry, dict) else global_steps)
        assert got == steps, (mode, got, steps)


def test_every_matrix_mode_has_an_algorithm_yaml():
    cfg = yaml.safe_load(open(
        os.path.join(REPO, "config", "evaluation", "LibriTTS.yaml")))
    algdir = os.path.join(REPO, "config", "algorithm")
    shipped = {f[:-5] for f in os.listdir(algdir) if f.endswith(".yaml")}
    for mode in cfg["modes"]:
        name = MODE_TO_ALGORITHM.get(mode, mode)
        assert name in shipped, f"mode {mode} -> no config/algorithm/{name}.yaml"


def test_run_matrix_multimode_tree(tmp_path):
    """Drive run_matrix over a fabricated >=6-mode result tree including a
    1-shot mode (per-sub-task task dirs 'test_NNN_k', step list to 1000) —
    the scale shape the shipped 31-mode grid produces."""
    import types
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

    def make_tree(name, ft_steps, subtasks=1):
        res = tmp_path / "result" / name
        for i, f in ((0, 210), (1, 510)):
            for k in range(subtasks):
                tid = f"test_{i:03d}" + (f"_{k}" if subtasks > 1 else "")
                task = res / "audio" / "Testing" / "step_last" / tid
                task.mkdir(parents=True)
                for u in ("u0", "u1"):
                    save_wav(str(task / f"{u}.recon.wav"), tone(f), sr)
                    for n in ft_steps:
                        save_wav(
                            str(task / f"{u}.step_last-FTstep_{n}.synth.wav"),
                            tone(f), sr)
        # frozen episode descriptions (the datamodule persists these under
        # the sibling log tree) -> run_matrix regroups tasks by speaker
        log = tmp_path / "log" / name
        log.mkdir(parents=True, exist_ok=True)
        (log / "test_descriptions.json").write_text(json.dumps(
            [{"label": "T-spk_s1"}, {"label": "T-spk_s2"}]))
        return str(res)

    steps = [0, 10]
    modes = {}
    for name in ("base_emb_vad", "meta_emb_vad", "base_emb1_vad",
                 "meta_emb1_vad"):
        modes[name] = make_tree(name, steps)
    modes["dvec"] = {"dir": make_tree("dvec", [0]), "ft_step_list": [0]}
    modes["meta_emb_vad-1_shot"] = {
        "dir": make_tree("meta_emb_vad-1_shot", [0, 10, 1000], subtasks=2),
        "ft_step_list": [0, 10, 1000]}

    cfg = {"corpus": "T", "real_dir": str(tmp_path / "real"), "n_sample": 4,
           "step_list": ["step_last"], "ft_step_list": steps, "modes": modes}
    cfg_path = tmp_path / "matrix.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    args = types.SimpleNamespace(
        config=str(cfg_path), out=str(tmp_path / "out"),
        dvector_weights=None, mosnet_weights=None, mbnet_weights=None,
        mos=False)
    ev.run_matrix(args)
    report = (tmp_path / "out" / "eer.txt").read_text()
    for name in ("base_emb_vad", "meta_emb_vad", "base_emb1_vad",
                 "meta_emb1_vad"):
        for n in steps:
            assert f"{name}_synth_step_last_FTstep{n}" in report
    assert "dvec_synth_step_last_FTstep0" in report
    assert "dvec_synth_step_last_FTstep10" not in report
    # 1-shot: steps to 1000, sub-task dirs pooled
    assert "meta_emb_vad-1_shot_synth_step_last_FTstep1000" in report
    # figures emitted at multi-mode scale
    for fig in ("det.png", "roc.png", "similarity_vs_step.png",
                "tsne_modes.png"):
        assert (tmp_path / "out" / fig).exists(), fig
