"""MAML system: second-order meta-learning over speaker episodes.

Reference ``lightning/systems/meta.py`` + ``base_adaptor.py``: training_step
adapts on the support set (5 SGD steps, second-order) and backprops the
query loss through the unrolled inner loop.  Here the whole meta-batch —
vmap over episodes, inner ``lax.scan``, grad-of-grad, optimizer update —
compiles to ONE XLA program; the episode axis shards over the device mesh
(`P("dp")`) so the grad mean becomes an ICI psum, replacing DDP.
"""

import jax
import jax.numpy as jnp
import optax

from .base import System
from ..models.loss import LossValues


class MetaSystem(System):
    algorithm_type = "meta"

    def _episode_loss(self, params, state, sup, qry, rng, train,
                      phn_ref=None):
        task = self.acfg["adapt"]["train"]
        losses, _, _ = self.adaptor.meta_learn(
            params, state, sup, qry,
            steps=task["steps"], lr=task["lr"], train=train, rng=rng,
            phn_ref=phn_ref)
        return losses

    def _meta_train_step(self, params, state, opt_state, sup, qry, rng,
                         phn_ref=None):
        """sup/qry: Batch pytrees with leading episode axis E; phn_ref
        (E, vocab, d_feat) regenerates the phoneme table per episode for
        cross-lingual adaptation (reference meta.py:24-33)."""
        n_episodes = sup.texts.shape[0]

        def meta_loss(params):
            rngs = jax.random.split(rng, n_episodes)
            if phn_ref is None:
                losses = jax.vmap(
                    lambda s, q, r: self._episode_loss(params, state, s, q,
                                                       r, True)
                )(sup, qry, rngs)
            else:
                losses = jax.vmap(
                    lambda s, q, r, pr: self._episode_loss(
                        params, state, s, q, r, True, pr)
                )(sup, qry, rngs, phn_ref)
            return jnp.mean(losses.total), losses

        (_, losses), grads = jax.value_and_grad(meta_loss, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mean_losses = LossValues(*[jnp.mean(l) for l in losses])
        return params, opt_state, mean_losses

    def train_step(self, sup_batch, qry_batch, phn_ref=None):
        """Host entry: one meta step over an episode-batched support/query.

        With enable_mesh() active (the CLI default on >1 device) the episode
        axis is sharded P("dp") and params/opt-state stay replicated — the
        grad mean compiles to an ICI psum, replacing the reference's DDP
        all-reduce."""
        name = "meta_train_lang" if phn_ref is not None else "meta_train"
        jit_kwargs = dict(donate_argnums=(0, 2))
        if self.mesh is not None:
            sup_batch = self._shard_episode_batch(sup_batch)
            qry_batch = self._shard_episode_batch(qry_batch)
            phn_ref = self._shard_episode_batch(phn_ref)
            jit_kwargs.update(
                in_shardings=(self._rep, self._rep, None, self._ep,
                              self._ep, self._rep,
                              self._ep if phn_ref is not None else None),
                out_shardings=(self._rep, None, self._rep))
        fn = self._cached_jit(name, self._meta_train_step, **jit_kwargs)
        rng = self.next_rng()
        if self.mesh is not None:
            rng = jax.device_put(rng, self._rep)
        self.params, self.opt_state, losses = fn(
            self.params, self.state, self.opt_state, sup_batch, qry_batch,
            rng, phn_ref)
        self.global_step += 1
        return losses

    def validation_step(self, sup_batch, qry_batch):
        """First-order adaptation at val (reference base_adaptor.py:107)."""
        def val(params, state, sup, qry, rng):
            return self._episode_loss(params, state, sup, qry, rng, False)

        fn = self._cached_jit("meta_val", val)
        return fn(self.params, self.state, sup_batch, qry_batch,
                  self.next_rng())

    # test_adapt is shared by all systems on the base System class
    # (reference shares BaseAdaptorSystem.test_step the same way).
