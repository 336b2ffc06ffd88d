"""The framework's core scientific capability, asserted at dev scale: a
meta-trained (second-order MAML) model adapts to HELD-OUT speakers better
than the multi-task baseline trained on the identical utterance budget from
the identical init — the loss analogue of the reference's headline result
(``/root/reference/evaluation/txt/LibriTTS/eer.txt``: meta 0.1776 vs
baseline 0.4309 EER at 10 adaptation steps).

Runs ``tools/exp_meta_advantage.py``'s importable ``run_experiment`` at the
calibrated dev configuration (tiny model/corpus, 250 outer steps — meta
training must get PAST its transient "adaptable-but-bad-init" phase, which
at this scale resolves around step ~200; truncating earlier measures the
transient and the ordering is genuinely absent there).  ~25-30 min on the
1-core CPU host — the cost of guarding the capability the framework exists
for.  Tolerant on purpose: it asserts ORDERINGS with headroom, not absolute
values.  Calibration numbers (seed 0, this exact config):

    step0:  meta ~12.4   base ~11.0
    step5:  meta ~8.2    base ~9.4
    step10: meta ~6.6    base ~8.0   (gain 0.54 vs 0.73 of step-0 loss)

The full-scale curves live in examples/meta_advantage/ (ROUND4.md §1).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_meta_beats_baseline_on_held_out_speakers():
    from exp_meta_advantage import run_experiment

    out = run_experiment(
        outer_steps=250, n_train=8, n_test=4, n_mels=4,
        shots=3, queries=3, meta_batch=4, inner_steps=5,
        inner_lr=0.001, test_lr=0.001,
        saving_steps=(5, 10), episodes_per_speaker=3, eval_queries=6,
        hidden=16, layers=1, seed=0, verbose=False,
        corpus_kwargs=dict(vocab=12, L=8, T=24))
    s = out["summary"]
    meta = {ft: s["meta"][ft]["mean"] for ft in (0, 5, 10)}
    base = {ft: s["baseline"][ft]["mean"] for ft in (0, 5, 10)}
    # few-shot adaptation must actually help both systems
    assert meta[10] < meta[0], (meta,)
    assert base[10] < base[0] * 1.05, (base,)
    # the meta-trained init adapts strictly better in the few-shot regime
    # (calibrated headroom ~17%; plain ordering, no margin, to stay robust
    # across BLAS/accumulation-order variation)
    assert meta[5] < base[5], (meta, base)
    assert meta[10] < base[10], (meta, base)
    # and the relative adaptation GAIN ordering holds with margin (seed-0
    # calibration: 0.54 vs 0.73 — ~26% headroom against 10% asserted)
    gain_meta = meta[10] / meta[0]
    gain_base = base[10] / base[0]
    assert gain_meta < gain_base * 0.9, (gain_meta, gain_base)
    # training produced finite traces
    tr = out["traces"]
    assert np.isfinite(tr["meta"]).all() and np.isfinite(tr["baseline"]).all()
