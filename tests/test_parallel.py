import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatts_tpu.parallel.mesh import make_mesh, shard_batch, replicate


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_dryrun_multichip_8():
    """Full sharded meta step over the 8-virtual-device CPU mesh."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The psum-sharded meta step must produce the same losses as the
    unsharded computation (SPMD correctness)."""
    import copy
    from __graft_entry__ import _configs, _batch
    from metatts_tpu.algorithms.meta import MetaSystem
    from jax.sharding import NamedSharding, PartitionSpec as P

    pcfg, mcfg, tcfg, acfg = _configs(tiny=True)
    sysm = MetaSystem(pcfg, mcfg, tcfg, acfg, n_speakers=8)
    rng = np.random.RandomState(0)

    def stack(seed):
        r = np.random.RandomState(seed)
        bs = [_batch(r, B=2, L=16, T=48, n_mels=8) for _ in range(8)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

    sup, qry = stack(0), stack(1)
    key = jax.random.PRNGKey(3)

    # single-device
    _, _, losses_single = jax.jit(sysm._meta_train_step)(
        sysm.params, sysm.state, sysm.opt_state, sup, qry, key)

    # sharded over the mesh
    mesh = make_mesh(8)
    ep = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    sup_s = shard_batch(sup, mesh)
    qry_s = shard_batch(qry, mesh)
    params = replicate(sysm.params, mesh)
    step = jax.jit(sysm._meta_train_step,
                   in_shardings=(rep, rep, None, ep, ep, rep),
                   out_shardings=(rep, None, rep))
    _, _, losses_sharded = step(params, replicate(sysm.state, mesh),
                                sysm.opt_state, sup_s, qry_s,
                                jax.device_put(key, rep))
    np.testing.assert_allclose(float(losses_single.total),
                               float(losses_sharded.total), rtol=2e-4)
