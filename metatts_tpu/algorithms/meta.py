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
        """Host entry: one meta step over an episode-batched support/query."""
        name = "meta_train_lang" if phn_ref is not None else "meta_train"
        fn = self._cached_jit(name, self._meta_train_step,
                              donate_argnums=(0, 2))
        self.params, self.opt_state, losses = fn(
            self.params, self.state, self.opt_state, sup_batch, qry_batch,
            self.next_rng(), phn_ref)
        self.global_step += 1
        return losses

    def validation_step(self, sup_batch, qry_batch):
        """First-order adaptation at val (reference base_adaptor.py:107)."""
        def val(params, state, sup, qry, rng):
            return self._episode_loss(params, state, sup, qry, rng, False)

        fn = self._cached_jit("meta_val", val)
        return fn(self.params, self.state, sup_batch, qry_batch,
                  self.next_rng())

    # --------------------------------------------------- test adaptation

    def test_adapt(self, sup_batch, qry_batch, ft_steps=None):
        """Test-time long adaptation with snapshot evaluation (reference
        ``base_adaptor.py:136-189``): first-order SGD on support in chunks,
        recording query recon loss at each snapshot step.

        Returns list of (step, LossValues) host-side.
        """
        test_cfg = self.acfg["adapt"]["test"]
        lr = test_cfg["lr"]
        saving_steps = ft_steps or test_cfg["saving_steps"]
        max_steps = test_cfg["steps"]

        def adapt_chunk(params, state, sup, rng, n):
            # eval-mode forward (no dropout) + first-order SGD, matching the
            # reference test loop (model.eval() + first_order adapt_)
            return self.adaptor.adapt(params, state, sup, steps=n, lr=lr,
                                      first_order=True, train=False, rng=None)

        def qry_eval(params, state, sup, qry, rng):
            qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(
                qry.texts.shape[0], axis=0)
                if not isinstance(sup.speaker_args, tuple)
                else sup.speaker_args)
            out, _ = self.adaptor.forward(params, state, qry_c, train=False,
                                          rng=None, average_spk_emb=True)
            return self.adaptor.loss(qry_c, out)

        eval_fn = self._cached_jit("test_eval", qry_eval)

        one_shot = test_cfg.get("1-shot", False)
        if one_shot:
            # reference base_adaptor.py:139-147: each adaptation step uses a
            # single support utterance, cycling through the support set
            import jax as _jax
            K = sup_batch.texts.shape[0]
            single_fn = self._cached_jit(
                "test_adapt_1shot",
                lambda p, st, s, r: adapt_chunk(p, st, s, r, 1))

            def slice_one(i):
                return _jax.tree.map(lambda x: x[i % K][None], sup_batch)

        results = []
        params = self.params
        results.append((0, eval_fn(params, self.state, sup_batch, qry_batch,
                                   None)))
        done = 0
        for target in sorted(s for s in saving_steps if s <= max_steps):
            n = target - done
            if n <= 0:
                continue
            if one_shot:
                for k in range(done, target):
                    params = single_fn(params, self.state, slice_one(k),
                                       self.next_rng())
            else:
                chunk_fn = self._cached_jit(
                    f"test_adapt_{n}",
                    lambda p, st, s, r, n=n: adapt_chunk(p, st, s, r, n))
                params = chunk_fn(params, self.state, sup_batch,
                                  self.next_rng())
            done = target
            results.append((target, eval_fn(params, self.state, sup_batch,
                                            qry_batch, None)))
        return results, params
