"""Baseline system: plain multi-task training, meta-style validation.

Reference ``lightning/systems/baseline.py:15-53``: training_step is a
supervised forward+loss over a flat batch; validation still adapts like MAML
(first-order) so baseline vs meta models are comparable at eval.
"""

import jax
import optax

from .base import System


class BaselineSystem(System):
    algorithm_type = "baseline"

    def _train_step(self, params, state, opt_state, batch, rng, step):
        (_, (losses, new_state)), grads = jax.value_and_grad(
            self._supervised_loss, has_aux=True)(
                params, state, batch, rng, True)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, losses

    def train_step(self, batch):
        """Host entry: one supervised step. Returns LossValues.

        With enable_mesh() the flat batch axis shards P("dp") (plain data
        parallelism — the reference trains baseline on 1 GPU but the DDP
        surface covers it too)."""
        jit_kwargs = dict(donate_argnums=(0, 1, 2))
        if self.mesh is not None:
            batch = self._shard_episode_batch(batch, what="batch_size")
            jit_kwargs.update(
                in_shardings=(self._rep, self._rep, None, self._ep,
                              self._rep, None),
                out_shardings=(self._rep, self._rep, None, self._rep))
        fn = self._cached_jit("train", self._train_step, **jit_kwargs)
        rng = self.next_rng()
        if self.mesh is not None:
            rng = jax.device_put(rng, self._rep)
        self.params, self.state, self.opt_state, losses = fn(
            self.params, self.state, self.opt_state, batch,
            rng, self.global_step)
        self.global_step += 1
        return losses

    def validation_step(self, sup_batch, qry_batch):
        """Meta-style validation (first-order adapt on support, eval query)."""
        task = self.acfg["adapt"]["train"]

        def val(params, state, sup, qry, rng):
            losses, _, _ = self.adaptor.meta_learn(
                params, state, sup, qry,
                steps=task["steps"], lr=task["lr"], train=False, rng=rng)
            return losses

        fn = self._cached_jit("val", val)
        return fn(self.params, self.state, sup_batch, qry_batch,
                  self.next_rng())
