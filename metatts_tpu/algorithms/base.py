"""System base: owns params/state/optimizer and compiled step functions.

Functional analogue of the reference's LightningModule ``System``
(``lightning/systems/system.py:26-213``): the object holds configuration and
*host-side* mutable slots (params, opt_state, step counter); all math happens
in jitted pure functions, cached per input-shape bucket.
"""


import jax
import numpy as np
import optax

from ..algorithms.adapt import Adaptor
from ..models.fastspeech2 import fastspeech2_init
from ..train.optim import make_optimizer


class System:
    def __init__(self, preprocess_cfg, model_cfg, train_cfg, algorithm_cfg,
                 stats=None, n_speakers=8, seed=43):
        if isinstance(preprocess_cfg, list):
            preprocess_cfg = preprocess_cfg[0]
        self.pcfg = preprocess_cfg
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.acfg = algorithm_cfg
        self.stats = stats or {"pitch": [-3.0, 10.0, 0.0, 1.0],
                               "energy": [-2.0, 10.0, 0.0, 1.0]}
        self.n_speakers = n_speakers
        self.adaptor = Adaptor(self.pcfg, model_cfg, algorithm_cfg)

        rng = jax.random.PRNGKey(seed)
        self.init_rng, self.train_rng = jax.random.split(rng)
        self.params, self.state = fastspeech2_init(
            self.init_rng, self.pcfg, model_cfg, algorithm_cfg,
            self.stats, n_speakers)

        # cross-lingual codebook (reference PhonemeEmbedding, meta.py:24-33):
        # trainable banks live in the params pytree so the outer loop
        # meta-learns them.
        if (algorithm_cfg["adapt"]["type"] == "lang"
                and algorithm_cfg["adapt"]["phoneme_emb"]["type"]
                == "codebook"):
            from ..models.phoneme_embedding import phoneme_embedding_init
            self.params["phn_emb_generator"] = phoneme_embedding_init(
                jax.random.fold_in(self.init_rng, 99), model_cfg,
                algorithm_cfg)
        self.tx, self.lr_schedule = make_optimizer(model_cfg, train_cfg)
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self._compiled = {}
        # dp mesh (None = single device); set by enable_mesh()
        self.mesh = None
        self._rep = None
        self._ep = None

    # ------------------------------------------------------- distribution

    def enable_mesh(self, n_devices=None):
        """Distribute the training step over a 1-D dp mesh — the CLI-reachable
        equivalent of the reference's default DDP recipe
        (``main.py:30-38``: gpus=-1, strategy='ddp'; one episode per GPU).

        The episode (or flat-batch) axis is sharded ``P("dp")``, params /
        state / optimizer state are replicated, and the mean over episodes
        inside the jitted step becomes an XLA psum over ICI.  Returns the
        mesh, or None when only one device is visible (single-chip runs are
        unchanged).  Scaling arithmetic: global batch = episodes_per_chip x
        n_chips x grad_acc_step (see CLAUDE.md).
        """
        from ..parallel.mesh import make_mesh, replicated, episode_sharding
        n = n_devices or len(jax.devices())
        if n <= 1:
            return None
        self.mesh = make_mesh(n)
        self._rep = replicated(self.mesh)
        self._ep = episode_sharding(self.mesh)
        self.params = jax.device_put(self.params, self._rep)
        self.state = jax.device_put(self.state, self._rep)
        self.opt_state = jax.tree.map(
            lambda x: jax.device_put(x, self._rep)
            if hasattr(x, "dtype") else x, self.opt_state)
        self._compiled = {}  # re-jit with explicit shardings
        return self.mesh

    def _shard_episode_batch(self, batch, what="meta_batch_size"):
        """Place a leading-axis-batched pytree onto the mesh (P('dp'))."""
        if self.mesh is None or batch is None:
            return batch
        n = int(np.prod(self.mesh.devices.shape))
        E = jax.tree.leaves(batch)[0].shape[0]
        if E % n:
            raise ValueError(
                f"{what}={E} must be a multiple of the {n}-device mesh "
                f"(reference recipe: 1 episode/device x grad_acc_step; "
                f"set optimizer.grad_acc_step to scale the effective batch)")
        return jax.tree.map(lambda x: jax.device_put(x, self._ep), batch)

    # ------------------------------------------------------------- utils

    def _cached_jit(self, name, fn, **jit_kwargs):
        if name not in self._compiled:
            self._compiled[name] = jax.jit(fn, **jit_kwargs)
        return self._compiled[name]

    def next_rng(self):
        self.train_rng, out = jax.random.split(self.train_rng)
        return out

    def apply_updates(self, grads):
        updates, self.opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        self.global_step += 1

    # ------------------------------------------------- shared step logic

    def _supervised_loss(self, params, state, batch, rng, train):
        out, new_state = self.adaptor.forward(params, state, batch,
                                              train=train, rng=rng)
        losses = self.adaptor.loss(batch, out)
        return losses.total, (losses, new_state)

    # ----------------------------------------------- batched validation

    def validation_step_batched(self, sup_stack, qry_stack):
        """Meta-style validation vmapped over a leading episode axis and
        sharded ``P("dp")`` on the mesh — all three systems validate with
        the same first-order ``meta_learn`` (the reference shares vanilla
        ``meta_learn`` across them, ``baseline.py:41-53``), so the batched
        form lives on the base.  Returns LossValues with (E,) fields."""
        import jax.numpy as jnp  # noqa: F401  (parity with test path)
        task = self.acfg["adapt"]["train"]
        E = jax.tree.leaves(sup_stack)[0].shape[0]

        def val_all(params, state, sup_E, qry_E, rngs):
            return jax.vmap(lambda s, q, r: self.adaptor.meta_learn(
                params, state, s, q, steps=task["steps"], lr=task["lr"],
                train=False, rng=r)[0])(sup_E, qry_E, rngs)

        fn = self._cached_jit("val_batched", val_all)
        if self.mesh is not None and \
                E % int(np.prod(self.mesh.devices.shape)) == 0:
            sup_stack = self._shard_episode_batch(sup_stack, "val batch")
            qry_stack = self._shard_episode_batch(qry_stack, "val batch")
        return fn(self.params, self.state, sup_stack, qry_stack,
                  jax.random.split(self.next_rng(), E))

    # --------------------------------------------------- test adaptation

    def _snapshot_keep(self, n_snapshots, episodes=1):
        """Return the snapshot-materialization fn for the test stage:
        identity (device-resident) or a packed host fetch, per
        ``adapt.test.snapshot_offload`` — see the ``test_adapt`` docstring
        for the byte math.  Host offload goes through
        ``utils.transfer.packed_device_get`` (one transfer per dtype group):
        per-leaf ``jax.device_get`` costs ~0.7 s PER LEAF through the
        remote-TPU tunnel (measured — see the transfer module docstring)."""
        import os
        from ..utils.backend import is_tpu
        from ..utils.transfer import packed_device_get
        mode = self.acfg["adapt"]["test"].get("snapshot_offload", "auto")
        if mode == "auto":
            param_bytes = sum(x.size * x.dtype.itemsize
                              for x in jax.tree.leaves(self.params))
            # on a real 16 GB TPU chip snapshots may take most of HBM —
            # host offload through the tunnel moves ~12 MB/s, so device
            # residency wins by orders of magnitude (utils/transfer.py)
            budget = float(os.environ.get(
                "METATTS_SNAPSHOT_HBM_BUDGET",
                10e9 if is_tpu() else 4e9))
            mode = ("device" if n_snapshots * episodes * param_bytes
                    <= budget else "host")
        return (lambda p: p) if mode == "device" else packed_device_get

    def test_adapt(self, sup_batch, qry_batch, ft_steps=None):
        """Test-time long adaptation with snapshot evaluation, SHARED by all
        three systems exactly as the reference shares
        ``BaseAdaptorSystem.test_step`` (``base_adaptor.py:136-189``):
        first-order SGD on the support set in chunks, recording the query
        recon loss and a full parameter snapshot at every saving step.

        Reference parity notes:
        * the inner SGD runs with dropout ACTIVE (the reference clones the
          learner and calls ``learner.train()``, ``base_adaptor.py:100-103``),
          so the support forwards here use ``train=True`` with a threaded
          rng;
        * the snapshot evaluations stay deterministic (``train=False``) — a
          deliberate divergence: the reference's post-adaptation query
          forwards inherit the clone's train mode (dropout on), which only
          adds eval noise; step-0 eval is dropout-off in both.

        Returns ``(rows, snapshots)`` where ``rows`` is a list of
        ``(ft_step, LossValues)`` and ``snapshots`` a list of
        ``(ft_step, params)`` — one per saving step including step 0 — so the
        caller can synthesize per-adaptation-step audio (the EER-vs-steps
        evaluation input, reference ``saver.py:130-194``).

        Snapshot residency (``adapt.test.snapshot_offload``): the consumer
        (``Trainer._save_test_audio``) feeds every snapshot straight back
        into a jitted synthesis forward, so host-offloading them costs a
        full device->host->device round trip per snapshot — at base scale
        ~140 MB fp32 each, ~2 GB per task.  Through the remote-TPU tunnel
        that round trip is catastrophic: ~0.7 s PER LEAF unpacked and only
        ~12-16 MB/s even packed (measured, ``utils/transfer.py``) — an
        8-wide batched trajectory offloaded leaf-by-leaf ran 25x SLOWER
        than sequential (BENCH 2026-08-19).  "auto" therefore keeps
        snapshots in HBM while ``n_snapshots x episodes x param_bytes``
        fits a budget (``METATTS_SNAPSHOT_HBM_BUDGET``; default 10 GB on a
        16 GB TPU chip, 4 GB elsewhere) and falls back to the packed host
        fetch beyond it.
        """
        test_cfg = self.acfg["adapt"]["test"]
        lr = test_cfg["lr"]
        saving_steps = ft_steps or test_cfg["saving_steps"]
        max_steps = test_cfg["steps"]

        def adapt_chunk(params, state, sup, rng, n):
            # dropout-active first-order SGD (reference clone().train() +
            # first_order adapt_, base_adaptor.py:100-111)
            return self.adaptor.adapt(params, state, sup, steps=n, lr=lr,
                                      first_order=True, train=True, rng=rng)

        # snapshot evaluation is a pure forward (never differentiated), so
        # it may use the fused FFT-block inference megakernel on TPU
        eval_mcfg = {**self.mcfg, "_fused_infer": True}

        def qry_eval(params, state, sup, qry, rng):
            qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(
                qry.texts.shape[0], axis=0)
                if not isinstance(sup.speaker_args, tuple)
                else sup.speaker_args)
            out, _ = self.adaptor.forward(params, state, qry_c, train=False,
                                          rng=None, average_spk_emb=True,
                                          mcfg=eval_mcfg)
            return self.adaptor.loss(qry_c, out)

        eval_fn = self._cached_jit("test_eval", qry_eval)

        rows = []
        params = self.params
        rows.append((0, eval_fn(params, self.state, sup_batch, qry_batch,
                                None)))
        targets = sorted(s for s in saving_steps if 0 < s <= max_steps)
        keep = self._snapshot_keep(len(targets) + 1)
        snapshots = [(0, keep(params))]
        # ONE compiled chunk program, sized to the gcd of the saving-step
        # gaps, looped to each target — the per-gap programs (5/10/30/50
        # for the reference schedule) each cost a multi-minute cold compile
        # on the tunneled TPU; extra chunk dispatches are ~ms
        import math
        gaps = [b - a for a, b in zip([0] + targets[:-1], targets)]
        chunk = math.gcd(*gaps) if gaps else 0
        chunk_fn = self._cached_jit(
            f"test_adapt_{chunk}",
            lambda p, st, s, r, n=chunk: adapt_chunk(p, st, s, r, n))
        done = 0
        for target in targets:
            for _ in range((target - done) // chunk):
                params = chunk_fn(params, self.state, sup_batch,
                                  self.next_rng())
            done = target
            rows.append((target, eval_fn(params, self.state, sup_batch,
                                         qry_batch, None)))
            snapshots.append((target, keep(params)))
        return rows, snapshots

    def test_adapt_batched(self, sup_stack, qry_stack, ft_steps=None):
        """Batched test adaptation: the full snapshot trajectory of
        ``test_adapt`` vmapped over a leading episode axis, sharded
        ``P("dp")`` when a mesh is enabled.

        The reference distributes test episodes one-per-GPU under DDP
        (``base_adaptor.py:151`` barriers after each); here E stacked
        same-bucket episodes (``collate_episode``) adapt concurrently — on
        an N-chip mesh each chip owns E/N trajectories, on one chip the
        episode axis batches the MXU.  Semantics match ``test_adapt``
        episode-wise (dropout-active first-order inner SGD, deterministic
        snapshot evals); only the dropout rng draws differ from a
        sequential run.  Snapshot residency follows the same
        ``adapt.test.snapshot_offload`` policy (see the ``test_adapt``
        docstring) with the episode count multiplying the HBM budget math —
        8-wide base-scale trajectories (6.7 GB of snapshots) still fit the
        10 GB TPU budget and stay device-resident.

        Returns ``(rows, snapshots)`` where every loss field and every
        snapshot leaf carries the leading episode axis.
        """
        import jax.numpy as jnp

        test_cfg = self.acfg["adapt"]["test"]
        lr = test_cfg["lr"]
        saving_steps = ft_steps or test_cfg["saving_steps"]
        max_steps = test_cfg["steps"]
        E = jax.tree.leaves(sup_stack)[0].shape[0]

        # NO fused megakernel here, unlike the sequential test_adapt: this
        # eval is vmapped over the episode axis, and jax.vmap's default
        # pallas batching folds the batch into the kernel's block — at
        # E=5 x 4 queries the (E, B, T, D) stream exceeds the 16 MB scoped
        # VMEM limit at TPU compile time (measured: 16.99 M requested,
        # probe_1shot_1000).  Weights are per-episode (adapted), so the
        # kernel can't simply flatten (E, B) either; the unfused forward
        # costs ~ms per snapshot eval against a 100-1000-step trajectory.
        eval_mcfg = dict(self.mcfg)

        def qry_eval(params, sup, qry):
            qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(
                qry.texts.shape[0], axis=0)
                if not isinstance(sup.speaker_args, tuple)
                else sup.speaker_args)
            out, _ = self.adaptor.forward(params, self.state, qry_c,
                                          train=False, rng=None,
                                          average_spk_emb=True,
                                          mcfg=eval_mcfg)
            return self.adaptor.loss(qry_c, out)

        eval_fn = self._cached_jit(
            "test_eval_batched",
            lambda ps, ss, qs: jax.vmap(qry_eval)(ps, ss, qs))

        targets = sorted(s for s in saving_steps if 0 < s <= max_steps)
        import math
        gaps = [b - a for a, b in zip([0] + targets[:-1], targets)]
        chunk = math.gcd(*gaps) if gaps else 0

        def chunk_all(params_E, sup_E, rngs):
            return jax.vmap(lambda p, s, r: self.adaptor.adapt(
                p, self.state, s, steps=chunk, lr=lr, first_order=True,
                train=True, rng=r))(params_E, sup_E, rngs)

        chunk_fn = self._cached_jit(f"test_adapt_batched_{chunk}", chunk_all)

        params_E = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (E,) + x.shape),
            self.params)
        if self.mesh is not None and \
                E % int(np.prod(self.mesh.devices.shape)) == 0:
            sup_stack = self._shard_episode_batch(sup_stack, "test batch")
            qry_stack = self._shard_episode_batch(qry_stack, "test batch")
            params_E = jax.tree.map(
                lambda x: jax.device_put(x, self._ep), params_E)

        keep = self._snapshot_keep(len(targets) + 1, episodes=E)
        rows = [(0, eval_fn(params_E, sup_stack, qry_stack))]
        snapshots = [(0, keep(params_E))]
        done = 0
        for target in targets:
            for _ in range((target - done) // chunk):
                params_E = chunk_fn(params_E, sup_stack,
                                    jax.random.split(self.next_rng(), E))
            done = target
            rows.append((target, eval_fn(params_E, sup_stack, qry_stack)))
            snapshots.append((target, keep(params_E)))
        return rows, snapshots

    def test_adapt_tasks(self, sup_batch, qry_batch, ft_steps=None):
        """Yield ``(suffix, rows, snapshots)`` per test sub-task.

        Standard mode: one sub-task, the full support set, suffix "".
        1-shot mode (``adapt.test.1-shot``): the reference test_step builds a
        ``Task`` minibatcher with batch_size=1 and runs an INDEPENDENT full
        adaptation trajectory per single support utterance
        (``base_adaptor.py:139-147``) — K sub-tasks, each adapting from the
        initial params on one utterance with the full query batch, emitted
        with suffix ``_<i>`` (the reference's per-sub-task outputs list).
        """
        if not self.acfg["adapt"]["test"].get("1-shot", False):
            rows, snapshots = self.test_adapt(sup_batch, qry_batch, ft_steps)
            yield "", rows, snapshots
            return
        K = sup_batch.texts.shape[0]
        if self.acfg["adapt"]["test"].get("batch_sub_tasks", True) and K > 1:
            # the K independent trajectories share every shape (one support
            # utterance each, the same query batch) — run them as ONE
            # vmapped batch instead of K serial trajectories
            import jax.numpy as jnp
            from ..models.loss import LossValues
            sup_K = jax.tree.map(
                lambda x: x[:, None] if hasattr(x, "shape") else x,
                sup_batch)                      # (K, 1, ...)
            qry_K = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (K,) + x.shape)
                if hasattr(x, "shape") else x, qry_batch)
            rows_K, snaps_K = self.test_adapt_batched(sup_K, qry_K, ft_steps)
            for i in range(K):
                rows = [(ft, LossValues(*[float(np.asarray(v)[i])
                                          for v in vals]))
                        for ft, vals in rows_K]
                snapshots = [(ft, jax.tree.map(lambda x: x[i], snap))
                             for ft, snap in snaps_K]
                yield f"_{i}", rows, snapshots
            return
        for i in range(K):
            sup_i = jax.tree.map(
                lambda x: x[i:i + 1] if hasattr(x, "shape") else x,
                sup_batch)
            rows, snapshots = self.test_adapt(sup_i, qry_batch, ft_steps)
            yield f"_{i}", rows, snapshots
