import numpy as np
import sys; sys.path.insert(0, "tests")
from metatts_tpu.algorithms import get_system
from helpers import (tiny_model_cfg, tiny_preprocess_cfg, tiny_train_cfg,
                     algorithm_cfg, synth_batch, STATS)


def test_grad_accumulation_updates_every_k():
    import jax, jax.numpy as jnp
    tcfg = tiny_train_cfg()
    tcfg["optimizer"]["grad_acc_step"] = 2
    sys_ = get_system("baseline")(tiny_preprocess_cfg(), tiny_model_cfg(),
                                  tcfg, algorithm_cfg("baseline"),
                                  stats=STATS, n_speakers=4)
    batch = synth_batch(np.random.RandomState(0), B=2)
    p0 = jax.tree.leaves(sys_.params)[0].copy()
    sys_.train_step(batch)      # micro-step 1: accumulate, no update
    p1 = jax.tree.leaves(sys_.params)[0]
    assert np.allclose(np.asarray(p0), np.asarray(p1))
    sys_.train_step(batch)      # micro-step 2: apply
    p2 = jax.tree.leaves(sys_.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
