"""Few-shot adaptation machinery (MAML-style inner loops).

TPU-native replacement for the reference's learn2learn module-cloning
machinery (``lightning/systems/base_adaptor.py``, ``systems/utils.py``):
params are a pytree, the inner loop is plain SGD expressed as ``lax.scan``
over grad steps, and the outer (meta) gradient is ``jax.grad`` straight
through the unrolled inner trajectory — grad-of-grad in one XLA program.

* ``partition``/``merge`` select the adapted sub-pytree by top-level key
  (== ``algorithm.adapt.modules``, reference ``base_adaptor.py:31-35``).
* ``first_order=True`` applies stop-gradient to the inner gradients (FOMAML)
  — the reference's val/test asymmetry (``base_adaptor.py:107``).
* Batch-norm state is frozen during the inner loop (train-mode batch stats
  are used for normalization, matching torch train mode; running-stat
  updates inside an episode never feed back into the episode's math).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fastspeech2 import fastspeech2_apply
from ..models.loss import fastspeech2_loss


def partition(params, modules):
    """Split params into (adapted, frozen) by top-level key."""
    adapted = {k: v for k, v in params.items() if k in modules}
    frozen = {k: v for k, v in params.items() if k not in modules}
    return adapted, frozen


def merge(adapted, frozen):
    return {**adapted, **frozen}


def _tree_vdot(a, b):
    return sum(jax.tree.leaves(jax.tree.map(
        lambda x, y: jnp.vdot(x, y), a, b)))


def _zero_cotangents(tree):
    """Zero cotangent pytree: float0 for integer leaves (JAX convention)."""
    return jax.tree.map(
        lambda x: jnp.zeros_like(x)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        else np.zeros(jnp.shape(x), jax.dtypes.float0), tree)


def make_hvp_sgd_step(adaptor, lr, train, fast_mcfg, exact_mcfg,
                      hvp_mode="rev"):
    """One inner SGD step ``a' = a - lr * grad_a L(a, frozen)`` with a
    hand-written second-order rule (custom_vjp).

    This is what lets the Pallas flash-attention kernel — a once-
    differentiable custom_vjp — run INSIDE the twice-differentiated MAML
    inner loop, and what removes the (B, h, T, T) attention-score residuals
    the unrolled double-backward stacks across the 5-step inner scan
    (the round-1 17 GB > 15.75 GB v5e wall):

      forward:  g computed on ``fast_mcfg`` (flash on TPU) — only ever
                differentiated once, inside this operator.
      backward: the exact step Jacobian VJP
                    da = u - lr * H_aa u,   dfrozen = -lr * H_fa u
                via ONE Hessian-vector product, recomputed from the saved
                step inputs on ``exact_mcfg`` (einsum + remat) — transient
                within each step's backward, never stored across the scan.

    Matches the autodiff-through-the-unrolled-step gradient exactly when
    fast == exact, and to kernel precision (~1e-6) with flash forward.
    Reference semantics: plain SGD at ``adapt.task.lr``, second-order only
    at train (``base_adaptor.py:98-112``).
    """

    def fast_grad(adapted, frozen, state, sup_batch, rng):
        return jax.grad(adaptor._support_loss)(
            adapted, frozen, state, sup_batch, train, rng, fast_mcfg)

    @jax.custom_vjp
    def sgd_step(adapted, frozen, state, sup_batch, rng):
        g = fast_grad(adapted, frozen, state, sup_batch, rng)
        return jax.tree.map(lambda p, gi: p - lr * gi, adapted, g)

    def fwd(adapted, frozen, state, sup_batch, rng):
        out = sgd_step(adapted, frozen, state, sup_batch, rng)
        return out, (adapted, frozen, state, sup_batch, rng)

    def bwd(res, u):
        adapted, frozen, state, sup_batch, rng = res

        if hvp_mode == "fwd":
            # forward-over-reverse: one jvp of the FULL gradient in the
            # tangent direction (u, 0).  By symmetry of mixed partials,
            # jvp(grad_{a,f} L)(u, 0) = (H_aa u, H_fa u) — the same pair
            # the reverse rule below computes, without differentiating
            # through a second reverse sweep (A/B'd on v5e: see ROUND4.md)
            def full_grad(a_, f_):
                return jax.grad(adaptor._support_loss, argnums=(0, 1))(
                    a_, f_, state, sup_batch, train, rng, exact_mcfg)

            zeros_f = jax.tree.map(jnp.zeros_like, frozen)
            _, (h_aa_u, h_fa_u) = jax.jvp(
                full_grad, (adapted, frozen), (u, zeros_f))
        else:
            def g_dot_u(a_, f_):
                g = jax.grad(adaptor._support_loss)(
                    a_, f_, state, sup_batch, train, rng, exact_mcfg)
                return _tree_vdot(g, u)

            h_aa_u, h_fa_u = jax.grad(g_dot_u, argnums=(0, 1))(adapted,
                                                               frozen)
        da = jax.tree.map(lambda ui, hi: ui - lr * hi, u, h_aa_u)
        df = jax.tree.map(lambda hi: -lr * hi, h_fa_u)
        return (da, df, _zero_cotangents(state),
                _zero_cotangents(sup_batch), _zero_cotangents(rng))

    sgd_step.defvjp(fwd, bwd)
    return sgd_step


class Adaptor:
    """Bundles the three config groups and exposes pure episode functions.

    Every method is functionally pure; jit-compiled entry points are built
    once per (shape-bucket, flags) via functools.partial + jax.jit in the
    training systems.
    """

    def __init__(self, preprocess_cfg, model_cfg, algorithm_cfg):
        self.pcfg = preprocess_cfg
        self.mcfg = model_cfg
        self.acfg = algorithm_cfg
        self.modules = tuple(algorithm_cfg["adapt"]["modules"])

    # ---------------------------------------------------------- forward

    def forward(self, params, state, batch, *, train=False, rng=None,
                teacher_forced=None, average_spk_emb=False, max_mel_len=None,
                mcfg=None):
        return fastspeech2_apply(
            params, state, batch, mcfg or self.mcfg, self.pcfg, self.acfg,
            train=train, rng=rng, teacher_forced=teacher_forced,
            average_spk_emb=average_spk_emb, max_mel_len=max_mel_len)

    def loss(self, batch, output):
        return fastspeech2_loss(batch, output, self.pcfg)

    # ------------------------------------------------------- inner loop

    def _support_loss(self, adapted, frozen, state, sup_batch, train, rng,
                      mcfg=None):
        out, _ = self.forward(merge(adapted, frozen), state, sup_batch,
                              train=train, rng=rng, mcfg=mcfg)
        return self.loss(sup_batch, out).total

    def adapt(self, params, state, sup_batch, *, steps, lr,
              first_order, train, rng=None):
        """Inner-loop SGD on the adapted sub-pytree. Returns merged params.

        Reference semantics (``base_adaptor.py:98-112``): plain SGD at
        ``adapt.task.lr`` on the support loss, second-order only when
        train and not first_order.

        Second-order implementations (``model.second_order_impl``):
          * "custom_hvp" (default) — each SGD step is a custom-VJP operator
            (``make_hvp_sgd_step``): fast once-differentiated forward
            gradient (impl from ``model.fast_attention_impl`` or the
            attention auto-resolve — the flash kernel is admissible here
            because only the exact einsum HVP backward is differentiated
            twice), exact HVP recomputed per step.  No (T, T) residuals
            stored across the scan.
          * "unrolled" — plain autodiff through the unrolled inner loop on
            the einsum(+remat) path (the flash custom_vjp kernel is only
            once-differentiable, so it is forced off here).
        """
        adapted, frozen = partition(params, self.modules)
        so_impl = self.mcfg.get("second_order_impl", "custom_hvp")

        if not first_order and so_impl == "custom_hvp":
            exact_mcfg = {**self.mcfg, "attention_impl":
                          self.mcfg.get("inner_attention_impl",
                                        "einsum_remat")}
            # fast-forward attention impl (model.fast_attention_impl):
            # default einsum_remat — the measured-fastest single SGD grad
            # step on v5e (10.7 ms vs einsum 12.2 / flash 13.1 at T=896
            # bf16, ROUND2.md shootout) and residual-lean (scores are
            # recomputed, not stored).  "flash" is admissible here (the
            # custom VJP differentiates only the exact einsum HVP twice)
            # but measured slower at the step level; off-TPU the Pallas
            # call has no compiled lowering at all, so downgrade it.
            fast_impl = self.mcfg.get("fast_attention_impl",
                                      "einsum_remat")
            from ..utils.backend import is_tpu
            if fast_impl == "flash" and not is_tpu():
                fast_impl = "einsum"
            step_fn = make_hvp_sgd_step(
                self, lr, train,
                fast_mcfg={**self.mcfg, "attention_impl": fast_impl},
                exact_mcfg=exact_mcfg,
                hvp_mode=self.mcfg.get("hvp_mode", "rev"))

            def step(carry, step_rng):
                return step_fn(carry, frozen, state, sup_batch,
                               step_rng), None
        else:
            # second-order unrolled inner loops are differentiated twice;
            # the flash attention kernel (custom_vjp) only supports one
            # differentiation, so force the einsum implementation there
            inner_impl = self.mcfg.get("inner_attention_impl",
                                       "einsum_remat")
            inner_mcfg = self.mcfg if first_order else \
                {**self.mcfg, "attention_impl": inner_impl}
            grad_fn = jax.grad(self._support_loss)

            def step(carry, step_rng):
                a = carry
                g = grad_fn(a, frozen, state, sup_batch, train, step_rng,
                            inner_mcfg)
                if first_order:
                    g = jax.lax.stop_gradient(g)
                a = jax.tree.map(lambda p, gi: p - lr * gi, a, g)
                return a, None

        step_rngs = (jax.random.split(rng, steps) if rng is not None
                     else [None] * steps)
        if rng is not None:
            adapted, _ = jax.lax.scan(step, adapted, step_rngs)
        else:
            for i in range(steps):
                adapted, _ = step(adapted, None)
        return merge(adapted, frozen)

    # ------------------------------------------- cross-lingual codebook

    def refresh_phoneme_table(self, params, phn_ref):
        """Regenerate the encoder phoneme table from support-set SSL
        representations (reference ``meta.py:24-33`` +
        ``phoneme_embedding.py:104-140``). Differentiable w.r.t. the
        codebook banks, so the outer loop meta-learns them."""
        from ..models.phoneme_embedding import get_new_embedding
        att = self.acfg["adapt"]["phoneme_emb"].get(
            "attention", {"type": "hard"})["type"]
        table = get_new_embedding(params["phn_emb_generator"], phn_ref, att)
        new_enc = dict(params["encoder"])
        new_enc["src_word_emb"] = {"table": table}
        return {**params, "encoder": new_enc}

    # -------------------------------------------------------- meta step

    def meta_learn(self, params, state, sup_batch, qry_batch, *,
                   steps, lr, train, rng=None, phn_ref=None):
        """Adapt on support, evaluate on query (reference
        ``base_adaptor.py:114-124``). Returns (LossValues, FS2Output, state).

        The query forward teacher-forces targets and averages the support
        speaker embedding (1-way task: all support utterances share the
        episode's speaker).
        """
        r_adapt, r_qry = (jax.random.split(rng) if rng is not None
                          else (None, None))
        if phn_ref is not None:
            params = self.refresh_phoneme_table(params, phn_ref)
        adapted = self.adapt(params, state, sup_batch,
                             steps=steps, lr=lr,
                             first_order=not train, train=train, rng=r_adapt)
        qry = qry_batch._replace(speaker_args=_episode_speaker_args(
            sup_batch.speaker_args, qry_batch.speaker_args))
        out, new_state = self.forward(adapted, state, qry, train=train,
                                      rng=r_qry, average_spk_emb=True)
        return self.loss(qry, out), out, new_state


def _episode_speaker_args(sup_args, qry_args):
    """Query synthesis conditions on the support speakers' (averaged)
    embedding — reference passes sup_batch[2] into the query forward
    (``base_adaptor.py:122``).

    For table/shared modes support shape (K,) != query shape (Q,); we take
    the support ids broadcast to the query count (1-way tasks: same speaker).
    """
    if isinstance(sup_args, tuple):
        return sup_args  # d-vector modes: ref mels come from support
    q = qry_args.shape[0]
    return jnp.broadcast_to(sup_args[:1], (q,))
