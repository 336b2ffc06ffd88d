import os

import pytest
import yaml

from metatts_tpu import config as cfg


def test_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": [1, 2]}
    b = {"x": {"z": 3}, "k": [9]}
    m = cfg.deep_merge(a, b)
    assert m == {"x": {"y": 1, "z": 3}, "k": [9]}
    assert a["x"]["z"] == 2  # no mutation


def test_defaults_valid():
    p, m, t, a = cfg.default_configs()
    assert isinstance(p, list) and p[0]["preprocessing"]["stft"]["hop_length"] == 256
    assert m["transformer"]["encoder_hidden"] == 256
    assert t["optimizer"]["warm_up_step"] == 4000
    assert a["type"] == "baseline"


def test_train_overlay_merge(tmp_path):
    base = tmp_path / "base.yaml"
    overlay = tmp_path / "corpus.yaml"
    base.write_text(yaml.dump({"step": {"total_step": 100}}))
    overlay.write_text(yaml.dump({"step": {"val_step": 7}}))
    t = cfg.load_train_configs([str(base), str(overlay)])
    assert t["step"]["total_step"] == 100
    assert t["step"]["val_step"] == 7
    assert t["optimizer"]["betas"] == [0.9, 0.98]  # defaults retained


def test_algorithm_validation(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.dump({"type": "nope"}))
    with pytest.raises(ValueError):
        cfg.load_algorithm_config(str(bad))
    bad.write_text(yaml.dump({"adapt": {"modules": ["bogus"]}}))
    with pytest.raises(ValueError):
        cfg.load_algorithm_config(str(bad))


def test_shipped_configs_load():
    cdir = cfg.CONFIG_DIR
    if not os.path.isdir(os.path.join(cdir, "algorithm")):
        pytest.skip("shipped configs not present")
    for name in os.listdir(os.path.join(cdir, "algorithm")):
        cfg.load_algorithm_config(os.path.join(cdir, "algorithm", name))
    for name in os.listdir(os.path.join(cdir, "model")):
        cfg.load_model_config(os.path.join(cdir, "model", name))
