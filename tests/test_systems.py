import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatts_tpu.algorithms import get_system
from metatts_tpu.algorithms.adapt import Adaptor, partition
from metatts_tpu.models.fastspeech2 import fastspeech2_init
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     algorithm_cfg, synth_batch, STATS)


def make_system(alg_type, **adapt_over):
    cls = get_system(alg_type)
    return cls(tiny_preprocess_cfg(), tiny_model_cfg(), tiny_train_cfg(),
               algorithm_cfg(alg_type, **adapt_over), stats=STATS,
               n_speakers=4)


@pytest.fixture(scope="module")
def meta_sys():
    return make_system("meta")


@pytest.fixture(scope="module")
def baseline_sys():
    return make_system("baseline")


def test_baseline_loss_decreases(baseline_sys):
    sys = baseline_sys
    rng = np.random.RandomState(0)
    batch = synth_batch(rng, B=4)
    first = float(sys.train_step(batch).total)
    for _ in range(15):
        losses = sys.train_step(batch)
    assert float(losses.total) < first
    assert sys.global_step == 16


def test_adapt_reduces_support_loss(meta_sys):
    sys = meta_sys
    adaptor = sys.adaptor
    sup = synth_batch(np.random.RandomState(1), B=2)

    def sup_loss(params):
        out, _ = adaptor.forward(params, sys.state, sup, train=False)
        return float(adaptor.loss(sup, out).total)

    before = sup_loss(sys.params)
    adapted = jax.jit(lambda p: adaptor.adapt(
        p, sys.state, sup, steps=5, lr=0.001,
        first_order=True, train=False, rng=None))(sys.params)
    after = sup_loss(adapted)
    assert after < before
    # frozen modules untouched
    _, frozen = partition(sys.params, adaptor.modules)
    for k in frozen:
        same = jax.tree.map(lambda a, b: np.allclose(a, b),
                            frozen[k], adapted[k])
        assert all(jax.tree.leaves(same)), f"{k} changed by adapt"


def test_meta_train_step_runs_and_learns(meta_sys):
    sys = meta_sys
    rng = np.random.RandomState(2)
    sup = synth_batch(rng, B=2, episode_axis=2)
    qry = synth_batch(rng, B=2, episode_axis=2)
    first = float(sys.train_step(sup, qry).total)
    for _ in range(10):
        losses = sys.train_step(sup, qry)
    assert np.isfinite(float(losses.total))
    assert float(losses.total) < first


def test_second_order_differs_from_first_order(meta_sys):
    """The MAML outer gradient must include the grad-through-inner-loop term."""
    sys = meta_sys
    adaptor = sys.adaptor
    rng = np.random.RandomState(3)
    sup = synth_batch(rng, B=2)
    qry = synth_batch(rng, B=2)

    def meta_loss(params, first_order):
        adapted = adaptor.adapt(params, sys.state, sup, steps=2, lr=0.01,
                                first_order=first_order, train=False,
                                rng=None)
        qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(2))
        out, _ = adaptor.forward(adapted, sys.state, qry_c, train=False,
                                 average_spk_emb=True)
        return adaptor.loss(qry_c, out).total

    g2 = jax.jit(jax.grad(lambda p: meta_loss(p, False)))(sys.params)
    g1 = jax.jit(jax.grad(lambda p: meta_loss(p, True)))(sys.params)
    # same loss value, different gradients
    d2 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g2["decoder"])])
    d1 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1["decoder"])])
    assert not np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)


def test_meta_validation_step(meta_sys):
    sys = meta_sys
    rng = np.random.RandomState(4)
    losses = sys.validation_step(synth_batch(rng, B=2), synth_batch(rng, B=2))
    assert np.isfinite(float(losses.total))


def test_test_adapt_snapshots(meta_sys):
    sys = meta_sys
    rng = np.random.RandomState(5)
    rows, snapshots = sys.test_adapt(synth_batch(rng, B=2),
                                     synth_batch(rng, B=1))
    steps = [s for s, _ in rows]
    assert steps == [0, 5, 10]
    for _, l in rows:
        assert np.isfinite(float(l.total))
    # one params snapshot per saving step (incl. step 0), and they differ —
    # per-step synthesis (the EER-vs-steps input) depends on this
    assert [s for s, _ in snapshots] == [0, 5, 10]
    p0, p10 = snapshots[0][1], snapshots[-1][1]
    delta = sum(float(jnp.abs(a - b).sum())
                for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p10)))
    assert delta > 0


def test_snapshot_offload_policy(meta_sys, monkeypatch):
    # auto: tiny params fit the budget -> snapshots stay device-resident
    # (the Trainer feeds them back into jitted synthesis; host round trips
    # dominate the test stage on a remote TPU — see System.test_adapt)
    keep = meta_sys._snapshot_keep(7)
    assert isinstance(keep(meta_sys.params["mel_linear"]["w"]), jax.Array)
    # auto under a tiny budget -> host offload (np.ndarray leaves)
    monkeypatch.setenv("METATTS_SNAPSHOT_HBM_BUDGET", "1")
    keep = meta_sys._snapshot_keep(7)
    assert isinstance(keep(meta_sys.params["mel_linear"]["w"]), np.ndarray)
    monkeypatch.delenv("METATTS_SNAPSHOT_HBM_BUDGET")
    # explicit modes override auto; monkeypatch.setitem restores the
    # module-scoped fixture's acfg even if an assertion fails mid-test
    monkeypatch.setitem(meta_sys.acfg["adapt"]["test"],
                        "snapshot_offload", "host")
    assert isinstance(meta_sys._snapshot_keep(7)(
        meta_sys.params["mel_linear"]["w"]), np.ndarray)
    monkeypatch.setitem(meta_sys.acfg["adapt"]["test"],
                        "snapshot_offload", "device")
    assert isinstance(meta_sys._snapshot_keep(7)(
        meta_sys.params["mel_linear"]["w"]), jax.Array)


@pytest.mark.parametrize("alg", ["baseline", "imaml"])
def test_test_adapt_shared_by_all_systems(alg, baseline_sys):
    """Reference shares BaseAdaptorSystem.test_step across meta/imaml/
    baseline (base_adaptor.py:136-189); test stage must not be meta-only."""
    sys = baseline_sys if alg == "baseline" else make_system(alg)
    rng = np.random.RandomState(8)
    rows, snapshots = sys.test_adapt(synth_batch(rng, B=2),
                                     synth_batch(rng, B=1))
    assert [s for s, _ in rows] == [0, 5, 10]
    assert all(np.isfinite(float(l.total)) for _, l in rows)
    assert len(snapshots) == len(rows)


def test_imaml_train_step():
    sys = make_system("imaml")
    rng = np.random.RandomState(6)
    sup = synth_batch(rng, B=2, episode_axis=2)
    qry = synth_batch(rng, B=2, episode_axis=2)
    first = float(sys.train_step(sup, qry).total)
    for _ in range(5):
        losses = sys.train_step(sup, qry)
    assert np.isfinite(float(losses.total))


def test_baseline_meta_style_validation(baseline_sys):
    sys = baseline_sys
    rng = np.random.RandomState(7)
    losses = sys.validation_step(synth_batch(rng, B=2), synth_batch(rng, B=2))
    assert np.isfinite(float(losses.total))


def test_custom_hvp_matches_unrolled_second_order(meta_sys):
    """The custom-VJP inner step (flash-capable, no (T,T) residuals across
    the scan) must produce the same outer gradients as plain autodiff
    through the unrolled inner loop."""
    sys = meta_sys
    rng = np.random.RandomState(9)
    sup, qry = synth_batch(rng, B=2), synth_batch(rng, B=2)
    key = jax.random.PRNGKey(11)

    def meta_grad(impl):
        adaptor = Adaptor(sys.pcfg, {**sys.mcfg, "second_order_impl": impl},
                          sys.acfg)

        def loss(p):
            l, _, _ = adaptor.meta_learn(p, sys.state, sup, qry,
                                         steps=3, lr=0.01, train=True,
                                         rng=key)
            return l.total
        return jax.jit(jax.grad(loss))(sys.params)

    g_hvp = meta_grad("custom_hvp")
    g_unr = meta_grad("unrolled")
    # identical tree structure -> aligned iteration order
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_hvp),
            jax.tree_util.tree_leaves_with_path(g_unr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=f"custom_hvp grad mismatch at {jax.tree_util.keystr(ka)}")


def _tree_l1(a, b):
    return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_test_adapt_one_shot_mode():
    """1-shot test adaptation (reference base_adaptor.py:136-153): the
    reference Task minibatcher with batch_size=1 runs an INDEPENDENT full
    adaptation trajectory per single support utterance — K sub-tasks each
    starting from the initial params, not one shared trajectory cycling
    through the support set."""
    sys = make_system("meta")
    sys.acfg["adapt"]["test"]["1-shot"] = True
    rng = np.random.RandomState(10)
    sup, qry = synth_batch(rng, B=3), synth_batch(rng, B=1)
    tasks = list(sys.test_adapt_tasks(sup, qry))
    assert [t[0] for t in tasks] == ["_0", "_1", "_2"]
    init = jax.device_get(sys.params)
    finals = []
    for suffix, rows, snapshots in tasks:
        assert [s for s, _ in rows] == [0, 5, 10]
        assert all(np.isfinite(float(l.total)) for _, l in rows)
        assert [s for s, _ in snapshots] == [0, 5, 10]
        # every trajectory starts at the shared initial params ...
        assert _tree_l1(snapshots[0][1], init) == 0.0
        # ... and actually adapts
        assert _tree_l1(snapshots[-1][1], init) > 0
        finals.append(snapshots[-1][1])
    # different support utterances -> different adapted params
    assert _tree_l1(finals[0], finals[1]) > 0
    assert _tree_l1(finals[1], finals[2]) > 0


GE2E_TINY = {"mel_channels": 8, "hidden": 16, "embed": 32, "layers": 2}
DVEC_DIMS = (2, 16, 8)   # (slices, ref frames, ref mel channels)


@pytest.mark.parametrize("mode", ["dvec", "encoder"])
def test_dvec_speaker_modes_through_systems(mode):
    """speaker_emb encoder/dvec — tuple speaker_args (ref_mels, slice_valid)
    — driven through the full system surface: train_step (second-order),
    validation_step, and the shared test_adapt.  The reference ablates
    these modes (speaker_encoder.py: trainable vs frozen VoiceEncoder);
    dvec must leave the GE2E params untouched (stop-gradient), encoder must
    train them."""
    cls = get_system("meta")
    sys = cls(tiny_preprocess_cfg(), tiny_model_cfg(ge2e=GE2E_TINY),
              tiny_train_cfg(), algorithm_cfg("meta", speaker_emb=mode),
              stats=STATS, n_speakers=4)
    rng = np.random.RandomState(21)
    sup = synth_batch(rng, B=2, episode_axis=2, dvec_dims=DVEC_DIMS)
    qry = synth_batch(rng, B=2, episode_axis=2, dvec_dims=DVEC_DIMS)
    before = jax.device_get(sys.params["speaker_emb"])
    losses = sys.train_step(sup, qry)
    assert np.isfinite(float(losses.total))
    delta = _tree_l1(sys.params["speaker_emb"], before)
    if mode == "dvec":
        assert delta == 0.0, "frozen GE2E params moved in dvec mode"
    else:
        assert delta > 0, "trainable GE2E params unchanged in encoder mode"

    v = sys.validation_step(synth_batch(rng, B=2, dvec_dims=DVEC_DIMS),
                            synth_batch(rng, B=2, dvec_dims=DVEC_DIMS))
    assert np.isfinite(float(v.total))

    rows, snaps = sys.test_adapt(synth_batch(rng, B=2, dvec_dims=DVEC_DIMS),
                                 synth_batch(rng, B=1, dvec_dims=DVEC_DIMS))
    assert [s for s, _ in rows] == [0, 5, 10]
    assert all(np.isfinite(float(l.total)) for _, l in rows)
    if mode == "dvec":
        assert _tree_l1(snaps[-1][1]["speaker_emb"],
                        before) == 0.0


def test_test_adapt_tasks_standard_mode_single(meta_sys):
    """Without 1-shot, test_adapt_tasks yields exactly one sub-task with an
    empty suffix (the reference's single _test_step output)."""
    rng = np.random.RandomState(12)
    tasks = list(meta_sys.test_adapt_tasks(synth_batch(rng, B=2),
                                           synth_batch(rng, B=1)))
    assert len(tasks) == 1 and tasks[0][0] == ""


def test_test_adapt_batched_matches_sequential(monkeypatch):
    """test_adapt_batched == per-episode test_adapt (dropout disabled so
    the inner-SGD rng draws are irrelevant — including the postnet's
    hardcoded 0.5): vmapped trajectories must be episode-wise identical
    to sequential ones."""
    from metatts_tpu.models import nn as mnn
    monkeypatch.setattr(mnn, "dropout", lambda rng, x, rate, train: x)
    cls = get_system("meta")
    mcfg = tiny_model_cfg()
    sys = cls(tiny_preprocess_cfg(), mcfg, tiny_train_cfg(),
              algorithm_cfg("meta"), stats=STATS, n_speakers=4)
    rng = np.random.RandomState(7)
    sups = [synth_batch(rng, B=2) for _ in range(2)]
    qrys = [synth_batch(rng, B=2) for _ in range(2)]
    sup_E = jax.tree.map(lambda *xs: jnp.stack(xs), *sups)
    qry_E = jax.tree.map(lambda *xs: jnp.stack(xs), *qrys)

    rows_E, snaps_E = sys.test_adapt_batched(sup_E, qry_E)
    assert [ft for ft, _ in rows_E] == [0, 5, 10]
    for e in range(2):
        rows, snaps = sys.test_adapt(sups[e], qrys[e])
        for (ft_b, vals_b), (ft_s, vals_s) in zip(rows_E, rows):
            assert ft_b == ft_s
            np.testing.assert_allclose(
                np.asarray(vals_b.total)[e], float(vals_s.total),
                rtol=2e-4, err_msg=f"episode {e} ft_step {ft_b}")
        leaf_b = snaps_E[-1][1]["mel_linear"]
        leaf_s = snaps[-1][1]["mel_linear"]
        np.testing.assert_allclose(
            jax.tree.leaves(leaf_b)[0][e], jax.tree.leaves(leaf_s)[0],
            rtol=2e-4, atol=1e-5)


def test_one_shot_batched_sub_tasks_match_sequential(monkeypatch):
    """1-shot sub-tasks route through ONE vmapped batch by default
    (test.batch_sub_tasks); trajectories must match the sequential
    per-utterance path (dropout patched out so rng draws are irrelevant)."""
    from metatts_tpu.models import nn as mnn
    monkeypatch.setattr(mnn, "dropout", lambda rng, x, rate, train: x)

    def build(batch_sub_tasks):
        cls = get_system("meta")
        sys = cls(tiny_preprocess_cfg(), tiny_model_cfg(), tiny_train_cfg(),
                  algorithm_cfg("meta"), stats=STATS, n_speakers=4)
        sys.acfg["adapt"]["test"]["1-shot"] = True
        sys.acfg["adapt"]["test"]["batch_sub_tasks"] = batch_sub_tasks
        return sys

    rng = np.random.RandomState(3)
    sup = synth_batch(rng, B=2)
    qry = synth_batch(rng, B=2)
    batched = list(build(True).test_adapt_tasks(sup, qry))
    sequential = list(build(False).test_adapt_tasks(sup, qry))
    assert [s for s, _, _ in batched] == ["_0", "_1"]
    assert [s for s, _, _ in sequential] == ["_0", "_1"]
    for (sb, rows_b, snaps_b), (ss, rows_s, snaps_s) in zip(batched,
                                                            sequential):
        for (ft_b, v_b), (ft_s, v_s) in zip(rows_b, rows_s):
            assert ft_b == ft_s
            np.testing.assert_allclose(float(v_b.total), float(v_s.total),
                                       rtol=2e-4, err_msg=f"{sb} ft={ft_b}")


def test_test_adapt_batched_dvec_tuple_args():
    """Batched trajectories with tuple speaker_args (ref-mel slices +
    validity masks, the dvec/encoder modes) — finite losses, moving
    params, correct leading episode axis."""
    cls = get_system("meta")
    sys = cls(tiny_preprocess_cfg(), tiny_model_cfg(ge2e=GE2E_TINY),
              tiny_train_cfg(), algorithm_cfg("meta", speaker_emb="dvec"),
              stats=STATS, n_speakers=4)
    rng = np.random.RandomState(11)
    sups = [synth_batch(rng, B=2, dvec_dims=DVEC_DIMS) for _ in range(2)]
    qrys = [synth_batch(rng, B=2, dvec_dims=DVEC_DIMS) for _ in range(2)]
    sup_E = jax.tree.map(lambda *xs: jnp.stack(xs), *sups)
    qry_E = jax.tree.map(lambda *xs: jnp.stack(xs), *qrys)
    rows, snaps = sys.test_adapt_batched(sup_E, qry_E)
    assert [ft for ft, _ in rows] == [0, 5, 10]
    for _, vals in rows:
        tot = np.asarray(vals.total)
        assert tot.shape == (2,) and np.isfinite(tot).all()
    p0 = snaps[0][1]["mel_linear"]
    pN = snaps[-1][1]["mel_linear"]
    delta = sum(float(np.abs(a - b).sum())
                for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(pN)))
    assert delta > 0


def test_hvp_mode_fwd_matches_rev():
    """model.hvp_mode selects the custom-HVP backward: "rev"
    (reverse-over-reverse grad of g.u) or "fwd" (one jvp of the full
    gradient — mixed-partial symmetry gives the same (H_aa u, H_fa u)).
    The meta-gradients must agree to fp accumulation order."""
    from metatts_tpu.algorithms.adapt import Adaptor
    from metatts_tpu.models.fastspeech2 import fastspeech2_init
    from helpers import tiny_model_cfg, tiny_preprocess_cfg, STATS

    rng = np.random.RandomState(0)
    sup = synth_batch(rng, B=2)
    qry = synth_batch(rng, B=2)
    grads = {}
    for mode in ("rev", "fwd"):
        m = tiny_model_cfg(hvp_mode=mode)
        acfg = algorithm_cfg("meta")
        ad = Adaptor(tiny_preprocess_cfg(), m, acfg)
        params, state = fastspeech2_init(
            jax.random.PRNGKey(3), tiny_preprocess_cfg(), m, acfg, STATS,
            n_speakers=4)

        def meta_obj(p):
            losses, _, _ = ad.meta_learn(
                p, state, sup, qry, steps=2, lr=0.01, train=True,
                rng=jax.random.PRNGKey(5))
            return losses.total

        grads[mode] = jax.grad(meta_obj)(params)
    r = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(grads["rev"])])
    f = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(grads["fwd"])])
    cos = float(r @ f / (np.linalg.norm(r) * np.linalg.norm(f)))
    assert cos > 0.999999
    assert float(np.linalg.norm(r - f) / np.linalg.norm(r)) < 1e-4
