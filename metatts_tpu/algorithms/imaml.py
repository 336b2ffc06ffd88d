"""iMAML system: implicit meta-gradients via conjugate gradient.

Reference ``lightning/systems/imaml.py`` + the hypertorch CG port in
``lightning/systems/utils.py:120-189``:

  inner:  w* ~= argmin_w  L_sup(w) + (reg/2)||w - theta0||^2   (K SGD steps)
  fp map: Phi(w, theta0, frozen) = w - lr * grad_w [L_sup(w) + reg-term]
  solve:  (I - dPhi/dw)^T x = grad_w L_qry(w*)      (CG, K iterations)
  hyper:  dL/dtheta0 = (dPhi/dtheta0)^T x
          dL/dfrozen = direct grad + (dPhi/dfrozen)^T x   (task-loss
          cross-Hessian into the non-adapted modules — the reference CG
          autodiffs Phi w.r.t. ALL of hmodel's params, so both terms exist
          there; tests/test_imaml_correctness.py anchors this against
          unrolled and finite-difference gradients)

In JAX the CG matvec is a VJP of the fixed-point map — no Hessian
materialization, one XLA program per step, grads psum over the episode axis
(the reference all-reduced each hypergrad by hand, ``imaml.py:132``).
"""

import jax
import jax.numpy as jnp
import optax

from .base import System
from .adapt import partition, merge
from ..models.loss import LossValues


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def _tree_dot(a, b):
    leaves = jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)
    return sum(jax.tree.leaves(leaves))


def tree_cg(matvec, b, iters):
    """Conjugate gradient on pytrees; fixed iteration count (XLA-friendly)."""
    x = jax.tree.map(jnp.zeros_like, b)
    r = b
    p = b
    rs = _tree_dot(r, r)

    def body(_, carry):
        x, r, p, rs = carry
        ap = matvec(p)
        pap = _tree_dot(p, ap)
        # indefinite curvature direction (inner Hessian is not PSD at a
        # random init): freeze instead of stepping along it
        alpha = jnp.where(pap > 1e-20, rs / jnp.maximum(pap, 1e-20), 0.0)
        x = jax.tree.map(lambda xi, pi: xi + alpha * pi, x, p)
        r = jax.tree.map(lambda ri, api: ri - alpha * api, r, ap)
        rs_new = _tree_dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = jax.tree.map(lambda ri, pi: ri + beta * pi, r, p)
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


class IMAMLSystem(System):
    algorithm_type = "imaml"

    def _inner_loss(self, adapted, frozen, theta0, state, sup, rng):
        """Support loss + proximal bias regularization (imaml.py:41-46).

        Uses the einsum attention path: the CG matvec takes VJPs of this
        loss's gradient (second-order), which the flash custom_vjp kernel
        does not support."""
        reg = self.acfg["adapt"]["imaml"]["reg_param"]
        mcfg = {**self.adaptor.mcfg, "attention_impl": "einsum"}
        out, _ = self.adaptor.forward(merge(adapted, frozen), state, sup,
                                      train=True, rng=rng, mcfg=mcfg)
        task_loss = self.adaptor.loss(sup, out).total
        sq = _tree_dot(_tree_sub(adapted, theta0), _tree_sub(adapted, theta0))
        return task_loss + 0.5 * reg * sq

    def _fp_map(self, adapted, theta0, frozen, state, sup, rng, lr):
        """One regularized SGD step — the fixed-point map Phi."""
        g = jax.grad(self._inner_loss)(adapted, frozen, theta0, state, sup,
                                       rng)
        return jax.tree.map(lambda w, gi: w - lr * gi, adapted, g)

    def _support_minibatch(self, sup, rng):
        """Size-``batch_size`` support draw for one inner step (the
        reference's Task minibatcher, ``imaml.py:51-73`` +
        ``systems/utils.py:80-117``: a shuffled BatchSampler over the
        collated support tuple).  Static shapes: ``batch_size`` is a config
        constant, the draw is a without-replacement gather on the leading
        support axis.  None/full-size keeps the whole support set."""
        bs = self.acfg["adapt"]["imaml"].get("batch_size")
        K = sup.texts.shape[0]
        if not bs or bs >= K:
            return sup
        idx = jax.random.choice(rng, K, shape=(bs,), replace=False)
        return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), sup)

    def _episode_hypergrad(self, params, state, sup, qry, rng):
        task = self.acfg["adapt"]["train"]
        cg_iters = self.acfg["adapt"]["imaml"]["cg_steps"]
        lr = task["lr"]
        steps = task["steps"]
        modules = self.adaptor.modules
        theta0, frozen = partition(params, modules)

        # inner loop (first-order; implicit grads replace unrolling); each
        # step adapts on a fresh support minibatch when
        # adapt.imaml.batch_size is set (reference imaml.py:51-73)
        r_inner, r_mb, r_fp, r_qry = jax.random.split(rng, 4)
        w = theta0
        for i in range(steps):
            sup_i = self._support_minibatch(sup, jax.random.fold_in(r_mb, i))
            w = self._fp_map(jax.lax.stop_gradient(w), theta0, frozen, state,
                             sup_i, jax.random.fold_in(r_inner, i), lr)
        w = jax.lax.stop_gradient(w)
        # the CG linearization point uses one fresh support draw (the
        # reference's stochastic CG redraws per iteration inside fp_map;
        # a VJP linearizes once, so this is one draw per outer step).
        # fold_in(steps) is distinct from every inner-step index 0..steps-1
        # (fold_in requires a non-negative value).
        sup_fp = self._support_minibatch(sup, jax.random.fold_in(r_mb, steps))

        # outer (query) loss and grads at w*
        def outer(w_, frozen_):
            qry_c = qry._replace(speaker_args=_sup_speaker_args(
                sup.speaker_args, qry.speaker_args))
            out, _ = self.adaptor.forward(merge(w_, frozen_), state, qry_c,
                                          train=True, rng=r_qry,
                                          average_spk_emb=True)
            return self.adaptor.loss(qry_c, out)

        def outer_total(w_, frozen_):
            return outer(w_, frozen_).total

        g_w, g_frozen = jax.grad(outer_total, argnums=(0, 1))(w, frozen)
        losses = outer(w, frozen)

        # CG solve (I - dPhi/dw)^T x = g_w  via VJP of the fp map
        _, vjp_w = jax.vjp(
            lambda w_: self._fp_map(w_, theta0, frozen, state, sup_fp, r_fp,
                                    lr),
            w)
        matvec = lambda x: _tree_sub(x, vjp_w(x)[0])
        x = tree_cg(matvec, g_w, cg_iters)

        # hypergrads through Phi's meta-parameter dependence: theta0 enters
        # via the proximal reg term ((dPhi/dtheta0)^T x = lr*reg*x) and the
        # FROZEN params enter via the task loss inside the inner gradient
        # ((dPhi/dfrozen)^T x = -lr * H_{frozen,w} x).  The reference's CG
        # autodiffs the fp map w.r.t. ALL of hmodel's params
        # (systems/utils.py:120-189 with hmodel=self.model), so both terms
        # are present there; dropping the frozen cross-term starves the
        # non-adapted modules (e.g. the encoder) of their indirect meta-
        # gradient — verified against unrolled/finite-difference gradients
        # in tests/test_imaml_correctness.py.
        _, vjp_meta = jax.vjp(
            lambda t0, f: self._fp_map(w, t0, f, state, sup_fp, r_fp, lr),
            theta0, frozen)
        hyper_t0, hyper_frozen = vjp_meta(x)
        return merge(hyper_t0, _tree_add(g_frozen, hyper_frozen)), losses

    def _train_step(self, params, state, opt_state, sup, qry, rng):
        n_episodes = sup.texts.shape[0]
        rngs = jax.random.split(rng, n_episodes)
        grads, losses = jax.vmap(
            lambda s, q, r: self._episode_hypergrad(params, state, s, q, r)
        )(sup, qry, rngs)
        grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
        # manual hypergrad hygiene (reference imaml.py:125-131 clips by
        # global norm before the DDP reduce): CG on the indefinite inner
        # Hessian can blow up, so zero non-finite components then clip.
        grads = jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0,
                                                      posinf=0.0,
                                                      neginf=0.0), grads)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
        clip = self.tcfg["optimizer"]["grad_clip_thresh"]
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        mean_losses = LossValues(*[jnp.mean(l) for l in losses])
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mean_losses

    def train_step(self, sup_batch, qry_batch):
        """One iMAML outer step; with enable_mesh() the episode axis shards
        P("dp") so the hypergrad mean psums over ICI (the reference
        all-reduced each hypergrad by hand, ``imaml.py:132``)."""
        jit_kwargs = dict(donate_argnums=(0, 2))
        if self.mesh is not None:
            sup_batch = self._shard_episode_batch(sup_batch)
            qry_batch = self._shard_episode_batch(qry_batch)
            jit_kwargs.update(
                in_shardings=(self._rep, self._rep, None, self._ep,
                              self._ep, self._rep),
                out_shardings=(self._rep, None, self._rep))
        fn = self._cached_jit("imaml_train", self._train_step, **jit_kwargs)
        rng = self.next_rng()
        if self.mesh is not None:
            rng = jax.device_put(rng, self._rep)
        self.params, self.opt_state, losses = fn(
            self.params, self.state, self.opt_state, sup_batch, qry_batch,
            rng)
        self.global_step += 1
        return losses

    def validation_step(self, sup_batch, qry_batch):
        # Intentional: validation runs the PLAIN (non-proximal) first-order
        # inner loop, not the reg_param-regularized iMAML one — the
        # reference's val path shares vanilla meta_learn the same way
        # (baseline.py:41-53 via base_adaptor.py:114-124).
        task = self.acfg["adapt"]["train"]

        def val(params, state, sup, qry, rng):
            losses, _, _ = self.adaptor.meta_learn(
                params, state, sup, qry,
                steps=task["steps"], lr=task["lr"], train=False, rng=rng)
            return losses

        fn = self._cached_jit("imaml_val", val)
        return fn(self.params, self.state, sup_batch, qry_batch,
                  self.next_rng())


def _sup_speaker_args(sup_args, qry_args):
    if isinstance(sup_args, tuple):
        return sup_args
    q = qry_args.shape[0]
    return jnp.broadcast_to(sup_args[:1], (q,))
