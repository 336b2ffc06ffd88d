import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatts_tpu.parallel.mesh import make_mesh, shard_batch, replicate


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_dryrun_multichip_8_tiny():
    """Sharded meta step over the 8-virtual-device CPU mesh, through the
    production System.enable_mesh + train_step codepath.  MUST stay on the
    tiny variant: inside the warm pytest process the raised XLA:CPU
    collective timeouts can't land (backend already initialized), and the
    h256 "mid" variant's per-device programs reach the psum rendezvous
    minutes apart -> the default 40 s abort SIGABRTs pytest.  The driver
    runs the "mid" variant in a fresh process."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8, variant="tiny")


def _stack(seed, E=8):
    from __graft_entry__ import _batch
    r = np.random.RandomState(seed)
    bs = [_batch(r, B=2, L=16, T=48, n_mels=8) for _ in range(E)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)


def test_sharded_matches_single_device():
    """The CLI-reachable mesh path (enable_mesh + train_step — what
    Trainer.fit runs) must produce the same losses and updated params as the
    identical single-device train_step (SPMD correctness)."""
    from __graft_entry__ import _configs
    from metatts_tpu.algorithms.meta import MetaSystem

    pcfg, mcfg, tcfg, acfg = _configs("tiny")
    sup, qry = _stack(0), _stack(1)

    sys_single = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    losses_single = sys_single.train_step(sup, qry)

    sys_mesh = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    assert sys_mesh.enable_mesh(8) is not None
    losses_sharded = sys_mesh.train_step(sup, qry)

    np.testing.assert_allclose(float(losses_single.total),
                               float(losses_sharded.total), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(sys_single.params),
                    jax.tree.leaves(sys_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_baseline_sharded_matches_single_device():
    """Baseline's flat-batch dp sharding (batch axis P('dp')) must match the
    single-device step — the other CLI-reachable mesh path besides meta."""
    from __graft_entry__ import _configs, _batch
    from metatts_tpu.algorithms.baseline import BaselineSystem

    pcfg, mcfg, tcfg, acfg = _configs("tiny")
    acfg = {**acfg, "type": "baseline"}
    batch = _batch(np.random.RandomState(2), B=16, L=16, T=48, n_mels=8)

    sys_single = BaselineSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    losses_single = sys_single.train_step(batch)

    sys_mesh = BaselineSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    assert sys_mesh.enable_mesh(8) is not None
    losses_sharded = sys_mesh.train_step(batch)

    np.testing.assert_allclose(float(losses_single.total),
                               float(losses_sharded.total), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(sys_single.params),
                    jax.tree.leaves(sys_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_imaml_sharded_matches_single_device():
    """iMAML's episode-sharded hypergradient (CG + psum mean, replacing the
    reference's hand all-reduce, imaml.py:132) must match single-device."""
    from __graft_entry__ import _configs
    from metatts_tpu.algorithms.imaml import IMAMLSystem

    pcfg, mcfg, tcfg, acfg = _configs("tiny")
    acfg = {**acfg, "type": "imaml"}
    sup, qry = _stack(0), _stack(1)

    sys_single = IMAMLSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    losses_single = sys_single.train_step(sup, qry)

    sys_mesh = IMAMLSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    assert sys_mesh.enable_mesh(8) is not None
    losses_sharded = sys_mesh.train_step(sup, qry)

    np.testing.assert_allclose(float(losses_single.total),
                               float(losses_sharded.total), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(sys_single.params),
                    jax.tree.leaves(sys_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_mesh_rejects_indivisible_batch():
    from __graft_entry__ import _configs
    from metatts_tpu.algorithms.meta import MetaSystem

    pcfg, mcfg, tcfg, acfg = _configs("tiny")
    sysm = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    sysm.enable_mesh(8)
    sup, qry = _stack(0, E=6), _stack(1, E=6)   # 6 % 8 != 0
    with pytest.raises(ValueError, match="multiple of the 8-device mesh"):
        sysm.train_step(sup, qry)
