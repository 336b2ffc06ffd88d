"""Round-trip the reference-checkpoint weight mapping: export our pytree as
a reference-shaped npz, load it into a fresh init, confirm every mapped
tensor transfers exactly (validates both directions of the name/layout
mapping in tools/load_reference_fs2.py)."""

import sys
import os

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from load_reference_fs2 import (load_reference_fs2,
                                export_reference_shaped_npz, build_mapping)
from metatts_tpu.models.fastspeech2 import fastspeech2_init
from helpers import tiny_model_cfg, tiny_preprocess_cfg, algorithm_cfg, STATS


def test_reference_weight_roundtrip(tmp_path):
    mcfg = tiny_model_cfg()
    pcfg = tiny_preprocess_cfg()
    acfg = algorithm_cfg("meta")
    src_params, src_state = fastspeech2_init(
        jax.random.PRNGKey(1), pcfg, mcfg, acfg, STATS, n_speakers=4)
    npz = str(tmp_path / "ref_shaped.npz")
    export_reference_shaped_npz(src_params, src_state, npz)

    dst_params, dst_state = fastspeech2_init(
        jax.random.PRNGKey(2), pcfg, mcfg, acfg, STATS, n_speakers=4)
    loaded_params, loaded_state, report = load_reference_fs2(
        npz, dst_params, dst_state)
    n = len(build_mapping(src_params))
    assert report[0] == f"loaded {n}/{n} tensors", report[:5]
    assert not any("mismatch" in r or "unmapped" in r for r in report[1:])

    # every mapped leaf must equal the source
    mapping = build_mapping(src_params)
    for name, (which, path, _) in mapping.items():
        a = src_params if which == "params" else src_state
        b = loaded_params if which == "params" else loaded_state
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)

    # and the mapping covers the whole trainable pytree (minus the
    # phn_emb_generator, which has no reference counterpart in spk mode)
    mapped_param_leaves = sum(
        1 for _, (w, _, _) in mapping.items() if w == "params")
    total_param_leaves = len(jax.tree.leaves(src_params))
    assert mapped_param_leaves == total_param_leaves


def test_loader_reports_shape_mismatch(tmp_path):
    mcfg = tiny_model_cfg()
    pcfg = tiny_preprocess_cfg()
    acfg = algorithm_cfg("meta")
    params, state = fastspeech2_init(
        jax.random.PRNGKey(1), pcfg, mcfg, acfg, STATS, n_speakers=4)
    npz = str(tmp_path / "bad.npz")
    export_reference_shaped_npz(params, state, npz)
    # load into a model with a DIFFERENT speaker count
    params8, state8 = fastspeech2_init(
        jax.random.PRNGKey(2), pcfg, mcfg, acfg, STATS, n_speakers=8)
    _, _, report = load_reference_fs2(npz, params8, state8)
    assert any("mismatch" in r and "speaker_emb" in r for r in report)
