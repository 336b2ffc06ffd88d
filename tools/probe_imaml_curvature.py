"""Measure the inner-loss curvature envelope behind iMAML's convergence
assumption (Rajeswaran et al. 2019 A1-A2: the proximal inner problem must
be strongly convex for the implicit gradient to exist).

Power-iterates the task-loss Hessian of the tiny test model at theta0 (top
and most-negative eigenvalue, via jvp-of-grad — no materialization) and
then checks fixed-point-map contraction empirically for candidate
(lr, reg) pairs by watching ||w_{k+1} - w_k||.

Round-5 measurement (seed 0, tiny 16-hidden FastSpeech2, CPU):

    lam(H_task) of largest magnitude ~ -1.78e3   (strongly NEGATIVE)
    -> no reg <= O(1e3) makes Phi a contraction, and a reg that does
       forces a per-step rate ~(1 - lr*(lam_min+reg)) so close to 1 that
       convergence needs far more steps than a compilable unrolled
       comparison graph allows on this host.

Consequence: the implicit-vs-unrolled comparison on the REAL model at a
random init is mathematically vacuous (neither estimator targets a
well-defined quantity there); tests/test_imaml_correctness.py anchors the
production ``_episode_hypergrad`` against a closed-form quadratic instead,
where the assumption holds by construction.  This probe is kept so the
measurement is reproducible.

Run:  METATTS_PLATFORM=cpu python tools/probe_imaml_curvature.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import jax

if os.environ.get("METATTS_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def tree_dot(a, b):
    return sum(jax.tree.leaves(
        jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)))


def tree_norm(a):
    return float(jnp.sqrt(tree_dot(a, a).real))


def power_iter(matvec, w, iters=30, seed=0):
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(jax.tree.leaves(w)))
    v = jax.tree.unflatten(
        jax.tree.structure(w),
        [jax.random.normal(k, x.shape)
         for k, x in zip(keys, jax.tree.leaves(w))])
    lam = 0.0
    for _ in range(iters):
        n = tree_norm(v)
        v = jax.tree.map(lambda x: x / n, v)
        hv = matvec(w, v)
        lam = float(tree_dot(v, hv).real)
        v = hv
    return lam


def main():
    from test_imaml_correctness import _make_system, _episode
    from metatts_tpu.algorithms.adapt import partition

    system = _make_system(steps=1, cg_steps=1, reg=0.0, lr=0.0)
    sup, qry = _episode()
    rng = jax.random.PRNGKey(7)
    r_inner, _, r_fp, _ = jax.random.split(rng, 4)
    theta0, frozen = partition(system.params, system.adaptor.modules)
    state = system.state

    def task_grad(w):
        # task-only inner loss (the reg=0 system makes the proximal term 0)
        return jax.grad(system._inner_loss)(w, frozen, theta0, state, sup,
                                            r_fp)

    hvp = jax.jit(lambda w, v: jax.jvp(task_grad, (w,), (v,))[1])

    lam_dom = power_iter(hvp, theta0, iters=30)
    print(f"dominant |lambda|(H_task) ~ {lam_dom:.1f}")
    c = abs(lam_dom) * 1.5
    shifted = jax.jit(lambda w, v: jax.tree.map(
        lambda a, b: c * a - b, v, hvp(w, v)))
    mu = power_iter(shifted, theta0, iters=30, seed=1)
    print(f"lambda_min(H_task) ~ {c - mu:.1f}")

    for lr, reg, K in [(0.02, 8.0, 16), (0.01, 50.0, 16),
                       (0.005, 150.0, 16), (0.002, 450.0, 16)]:
        sysK = _make_system(steps=K, cg_steps=1, reg=reg, lr=lr)
        th0, fz = partition(sysK.params, sysK.adaptor.modules)
        w = th0
        deltas = []
        for i in range(K):
            w2 = sysK._fp_map(w, th0, fz, state, sup,
                              jax.random.fold_in(r_inner, i), lr)
            deltas.append(tree_norm(jax.tree.map(
                lambda a, b: a - b, w2, w)))
            w = w2
        head = ", ".join(f"{d:.3e}" for d in deltas[:3])
        tail = ", ".join(f"{d:.3e}" for d in deltas[-3:])
        print(f"lr={lr} reg={reg}: ||dw|| {head} ... {tail} "
              f"(contracting iff -> 0)")


if __name__ == "__main__":
    main()
