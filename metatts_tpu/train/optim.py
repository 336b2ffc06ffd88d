"""Optimizer: Adam with Noam warmup + step anneal.

Reference: ``lightning/optimizer.py:7-16`` (Adam, lr = d_model^-0.5 scaled,
betas (0.9, 0.98), eps 1e-9) and ``lightning/scheduler.py:6-29`` (warmup
4000 then inverse-sqrt, x anneal_rate at each anneal step).
"""

import jax.numpy as jnp
import numpy as np
import optax


def noam_schedule(d_model, warmup, anneal_steps, anneal_rate):
    init_lr = float(np.power(d_model, -0.5))
    # anneal_steps is static config; an empty list means "never anneal" —
    # not "anneal from step 0" (a `or [0]` fallback here would multiply the
    # lr by anneal_rate immediately, since step >= 0 is always true).
    has_anneals = len(anneal_steps or []) > 0
    anneal_arr = jnp.asarray(anneal_steps if has_anneals else [0], jnp.int32)

    def lr(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        base = init_lr * jnp.minimum(s ** -0.5, s * float(warmup) ** -1.5)
        if not has_anneals:
            return base
        n_anneals = jnp.sum(step >= anneal_arr)
        return base * (anneal_rate ** n_anneals.astype(jnp.float32))

    return lr


def make_optimizer(model_cfg, train_cfg):
    o = train_cfg["optimizer"]
    sched = noam_schedule(model_cfg["transformer"]["encoder_hidden"],
                          o["warm_up_step"], o["anneal_steps"],
                          o["anneal_rate"])
    tx = optax.chain(
        optax.clip_by_global_norm(o["grad_clip_thresh"]),
        optax.scale_by_adam(b1=o["betas"][0], b2=o["betas"][1], eps=o["eps"]),
        optax.add_decayed_weights(o.get("weight_decay", 0.0)),
        optax.scale_by_learning_rate(sched),
    )
    # grad accumulation (reference accumulate_grad_batches, main.py:62):
    # one optimizer update every grad_acc_step micro-batches — how an
    # effective meta-batch of 8 runs on fewer chips (second-order episodes
    # are HBM-bound at ~1/chip on v5e).
    acc = int(o.get("grad_acc_step", 1) or 1)
    if acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc)
    return tx, sched
