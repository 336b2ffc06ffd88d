"""Training loops (the pl.Trainer equivalent, host-side orchestration).

Stages mirror the reference CLI (``main.py:84-139``): train / test /
predict / debug.  The loop is deliberately thin — all math lives in the
systems' jitted step functions; this file does scheduling, logging,
checkpointing, validation cadence.
"""

import os
import time

import numpy as np

from .checkpoint import save_checkpoint, load_checkpoint
from .saver import Saver
from .logging import ExperimentLogger
from ..models.loss import LossValues


def _first_episode(batch):
    """Drop the leading episode axis from a stacked episode Batch."""
    import jax
    return jax.tree.map(lambda x: x[0], batch)


class Trainer:
    def __init__(self, system, datamodule, train_cfg, output_dir="output",
                 exp_name="exp", log_every=None, vocoder=None):
        self.system = system
        self.dm = datamodule
        self.tcfg = train_cfg
        self.steps = train_cfg["step"]
        self.output_dir = output_dir
        self.exp_name = exp_name
        self.ckpt_dir = os.path.join(output_dir, "ckpt", exp_name)
        self.saver = Saver(
            log_dir=os.path.join(output_dir, "log", exp_name),
            result_dir=os.path.join(output_dir, "result", exp_name))
        self.logger = ExperimentLogger(self.saver.log_dir, exp_name)
        self.vocoder = vocoder
        from ..data.collate import set_mel_transfer_dtype
        set_mel_transfer_dtype(train_cfg.get("transfer_mel_dtype", "auto"))

    # ------------------------------------------------------------- train

    def fit(self, resume_from=None, max_steps=None):
        sys = self.system
        total = max_steps or self.steps["total_step"]
        log_every = self.steps["log_step"]
        val_every = self.steps["val_step"]
        save_every = self.steps["save_step"]

        self.logger.log_hyperparams({
            "model": self.system.mcfg, "train": self.tcfg,
            "algorithm": self.system.acfg})

        if resume_from:
            params, state, opt_state, step, report = load_checkpoint(
                resume_from, sys.params, sys.state, sys.opt_state)
            sys.params, sys.state = params, state
            if opt_state is not None:
                sys.opt_state = opt_state
            sys.global_step = step
            for r in report:
                print(f"[ckpt surgery] {r}")

        meta = sys.algorithm_type in ("meta", "imaml")

        # Distribution (reference default recipe IS distributed:
        # main.py:30-38 gpus=-1 strategy='ddp'): on >1 visible device, shard
        # the episode/batch axis over a dp mesh unless train.distributed: off.
        # Mesh size = gcd(devices, batch) so the shard is always exact; the
        # reference recipe (1 episode/GPU, meta_batch_size == GPU count) uses
        # every chip.
        if self.tcfg.get("distributed", "auto") != "off":
            import math
            import jax
            n_dev = len(jax.devices())
            E = (sys.acfg["adapt"]["train"]["meta_batch_size"] if meta
                 else self.tcfg["optimizer"]["batch_size"])
            n_use = math.gcd(n_dev, int(E))
            mesh = sys.enable_mesh(n_use) if n_use > 1 else None
            if mesh is not None:
                print(f"[mesh] dp mesh over {mesh.devices.size} "
                      f"{jax.devices()[0].platform} devices; "
                      f"{'episode' if meta else 'batch'} axis sharded "
                      f"P('dp'), params replicated")
            if 1 < n_use < n_dev:
                print(f"[mesh] note: batch {E} uses {n_use} of {n_dev} "
                      f"devices; set "
                      f"{'meta_batch_size' if meta else 'batch_size'} to a "
                      f"multiple of {n_dev} to use the full slice")

        if meta:
            mb = sys.acfg["adapt"]["train"]["meta_batch_size"]
            gen = self.dm.train_episode_batches(mb)
        else:
            bs = self.tcfg["optimizer"]["batch_size"]
            gen = self.dm.train_batches(bs)
        from ..data.prefetch import Prefetcher
        gen = Prefetcher(gen, depth=2)   # hide collation behind device time

        try:
            from tqdm import tqdm
            pbar = tqdm(total=total, initial=sys.global_step, desc="train",
                        dynamic_ncols=True)
        except ImportError:
            pbar = None

        # reference parity: the Trainer always runs Lightning's 'simple'
        # profiler (main.py:37). "simple" = host-side per-step wall stats
        # (mean/p50/p95); "trace" additionally captures a jax.profiler
        # XPlane trace of a few steps; "off" disables.
        prof_mode = self.tcfg.get("profile", "simple")
        from ..utils.profiling import StepTimer, trace, device_memory_stats
        timer = StepTimer() if prof_mode != "off" else None
        trace_cm = None

        t0 = time.time()
        t_warm = None   # wall-clock start AFTER the first (compiling) step
        warm_step = None
        while sys.global_step < total:
            if prof_mode == "trace" and sys.global_step == 3 and \
                    trace_cm is None:
                trace_cm = trace(os.path.join(self.saver.log_dir, "profile"))
                trace_cm.__enter__()
            if timer:
                timer.__enter__()
            if meta:
                item = next(gen)
                sup, qry = item[0], item[1]
                phn_ref = item[4] if len(item) > 4 else None
                losses = sys.train_step(sup, qry) if phn_ref is None \
                    else sys.train_step(sup, qry, phn_ref=phn_ref)
            else:
                batch, _ = next(gen)
                losses = sys.train_step(batch)
            step = sys.global_step
            if pbar is not None:
                pbar.update(1)
                pbar.set_postfix(total=f"{float(losses.total):.3f}")
            elif timer:
                float(losses.total)   # force host sync so wall is real
            if timer:
                timer.__exit__()
            if t_warm is None:
                t_warm, warm_step = time.time(), step
            if trace_cm is not None and step >= 8:
                trace_cm.__exit__(None, None, None)
                trace_cm = None
                prof_mode = "simple"
            if step % log_every == 0 or step == total:
                self.saver.log_train(step, losses)
                self.logger.log_metrics(step, losses.to_dict("train/"))
                rate = step / max(time.time() - t0, 1e-9)
                prof = ""
                if timer and timer.stats():
                    s = timer.stats()
                    prof = (f" step {s['mean_ms']:.0f}ms "
                            f"p95 {s['p95_ms']:.0f}ms")
                    self.logger.log_metrics(step, {
                        "profile/step_mean_ms": s["mean_ms"],
                        "profile/step_p95_ms": s["p95_ms"]})
                print(f"step {step}/{total} total={float(losses.total):.4f} "
                      f"mel={float(losses.mel):.4f} ({rate:.2f} it/s{prof})")
            if step % val_every == 0 and hasattr(self.dm, "val_episodes"):
                self.validate(step)
            synth_every = self.steps.get("synth_step", 0)
            if self.vocoder is not None and synth_every and \
                    step % synth_every == 0:
                try:
                    self.synth_sample(step, sup if meta else batch,
                                      episode_batched=meta)
                except Exception as e:  # synthesis must not kill training
                    print(f"[synth_step {step}] failed: {e}")
            if step % save_every == 0 or step == total:
                path = os.path.join(self.ckpt_dir, f"step_{step}.ckpt")
                save_checkpoint(path, sys.params, sys.state, sys.opt_state,
                                step)
                save_checkpoint(os.path.join(self.ckpt_dir, "last.ckpt"),
                                sys.params, sys.state, sys.opt_state, step)
        if timer and timer.stats():
            s = timer.stats()
            mem = device_memory_stats()
            peak = max((m.get("peak_bytes_in_use") or 0
                        for m in mem.values()), default=0)
            # e2e = steps/sec over the post-compile window INCLUDING val /
            # checkpoint / logging overhead (the StepTimer excludes those —
            # it only wraps next(gen)+train_step); the gap between the two
            # is the trainer's non-step overhead, the thing a sustained-fit
            # bench exists to expose.
            e2e = ""
            if t_warm is not None and sys.global_step > warm_step:
                e2e_rate = (sys.global_step - warm_step) / max(
                    time.time() - t_warm, 1e-9)
                e2e = f", e2e {e2e_rate:.2f} it/s incl val/ckpt"
                self.logger.log_metrics(sys.global_step, {
                    "profile/e2e_steps_per_sec": e2e_rate})
            print(f"[profile] {s['steps']} steps: mean {s['mean_ms']:.1f}ms "
                  f"p50 {s['p50_ms']:.1f}ms p95 {s['p95_ms']:.1f}ms "
                  f"({s['steps_per_sec']:.2f} it/s{e2e})"
                  + (f"; peak HBM {peak / 2**30:.2f} GiB" if peak else ""))
            self.logger.log_metrics(sys.global_step, {
                "profile/final_mean_ms": s["mean_ms"],
                "profile/final_p95_ms": s["p95_ms"],
                **({"profile/peak_hbm_bytes": peak} if peak else {})})
        return sys

    # ---------------------------------------------------------- validate

    def validate(self, step, max_tasks=None, task_batch=None):
        """Episodic validation; like the test stage, episodes run in
        vmapped batches of ``task_batch`` (default ``train.test_task_batch``,
        "auto" = device count) sharded over the mesh — the reference
        validates under the same DDP distribution it trains with."""
        import jax
        from ..data.collate import collate_episode
        tb = task_batch or self.tcfg.get("test_task_batch", 1)
        if tb == "auto":
            tb = max(1, len(jax.devices()))
        totals = []
        first_pair = [None]

        def record(i, losses_list):
            totals.append(losses_list)
            self.saver.log_task_csv("Validation", f"val_{i:03d}",
                                    [(step, LossValues(*losses_list))])

        def run_batched(buf):
            idxs = [b[0] for b in buf]
            sup_b, qry_b, _, _ = collate_episode(
                [b[1] for b in buf], [b[2] for b in buf])
            if first_pair[0] is None:
                first_pair[0] = (jax.tree.map(lambda x: x[0], sup_b),
                                 jax.tree.map(lambda x: x[0], qry_b))
            if len(buf) == 1:
                losses = self.system.validation_step(
                    _first_episode(sup_b), _first_episode(qry_b))
                record(idxs[0], [float(x) for x in losses])
                return
            losses_E = self.system.validation_step_batched(sup_b, qry_b)
            for e, i in enumerate(idxs):
                record(i, [float(np.asarray(x)[e]) for x in losses_E])

        buf = []
        for i, (desc, (sup, qry)) in enumerate(self.dm.val_episodes()):
            if max_tasks and i >= max_tasks:
                break
            buf.append((i, sup, qry))
            if len(buf) == max(1, int(tb)):
                run_batched(buf)
                buf = []
        if buf:
            run_batched(buf)
        if first_pair[0] is not None and self.vocoder is not None:
            # first-batch audio + synthesized-vs-ground-truth figure
            # (reference Saver on_validation_batch_end batch_idx==0,
            # saver.py:96-105)
            try:
                self._save_val_sample(step, *first_pair[0])
            except Exception as e:  # synthesis must not kill validation
                print(f"[val synth @ {step}] failed: {e}")
        if totals:
            mean = np.mean(totals, axis=0)
            print(f"[val @ {step}] total={mean[0]:.4f} mel={mean[1]:.4f}")
        return totals

    def _save_val_sample(self, step, sup, qry):
        """Adapt on the support set like the val step (first-order, train
        task steps/lr), run a teacher-forced query forward, and write the
        reconstruction + prediction wavs and a two-panel synthesized vs
        ground-truth spectrogram with target pitch/energy tracks — the
        reference's ``synth_one_sample_with_target`` validation artifacts
        (``callbacks/utils.py:11-54``)."""
        from .synth_utils import expand_by_duration, denormalize

        task = self.system.acfg["adapt"]["train"]
        adaptor = self.system.adaptor

        def val_synth(params, state, sup, qry, rng):
            adapted = adaptor.adapt(
                params, state, sup, steps=task["steps"], lr=task["lr"],
                first_order=True, train=False, rng=None)
            qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(
                qry.texts.shape[0], axis=0)
                if not isinstance(sup.speaker_args, tuple)
                else sup.speaker_args)
            out, _ = adaptor.forward(adapted, state, qry_c, train=False,
                                     average_spk_emb=True)
            return out

        fn = self.system._cached_jit("val_synth", val_synth)
        out = fn(self.system.params, self.system.state, sup, qry, None)

        hop = self.system.pcfg["preprocessing"]["stft"]["hop_length"]
        mel_len = int(np.asarray(qry.mel_lens)[0])  # teacher-forced: == pred
        if mel_len <= 0:
            return
        mel_pred = np.asarray(out.postnet_mel)[0, :mel_len]
        # explicit fp32: mels may ride the wire as bf16
        # (train.transfer_mel_dtype), and ml_dtypes arrays upset
        # matplotlib/vocoder numpy paths downstream
        mel_target = np.asarray(qry.mels, np.float32)[0, :mel_len]
        for tag, mel in (("reconstructed", mel_target),
                         ("synthesized", mel_pred)):
            wav = self.vocoder.infer(mel[None], lengths=[mel_len * hop])[0]
            path = self.saver.save_audio("Validation", f"step_{step}",
                                         f"sample.{tag}", wav)
            self.logger.log_artifact(step, "audio", path)

        # target pitch/energy tracks on both panels (reference
        # synth_one_sample_with_target uses the targets)
        src_len = int(np.asarray(qry.src_lens)[0])
        d = np.asarray(qry.d_targets)[0, :src_len]
        pcfg = self.system.pcfg["preprocessing"]
        stats = self.system.stats
        pitch = np.asarray(qry.p_targets)[0]
        energy = np.asarray(qry.e_targets)[0]
        pitch = (expand_by_duration(pitch[:src_len], d)
                 if pcfg["pitch"]["feature"] == "phoneme_level"
                 else pitch)[:mel_len]
        energy = (expand_by_duration(energy[:src_len], d)
                  if pcfg["energy"]["feature"] == "phoneme_level"
                  else energy)[:mel_len]
        pitch = denormalize(pitch, stats["pitch"][2], stats["pitch"][3])
        energy = denormalize(energy, stats["energy"][2], stats["energy"][3])
        fig = self.saver.save_panel_figure(
            "Validation", f"step_{step}", "sample",
            [(mel_pred, pitch, energy), (mel_target, pitch, energy)],
            ["Synthesized Spectrogram", "Ground-Truth Spectrogram"])
        self.logger.log_artifact(step, "figure", fig)

    # -------------------------------------------------------------- test

    def test(self, ckpt_step="last", max_tasks=None, tasks_per_label=None,
             task_batch=None):
        """Few-shot test: adapt on support, synthesize query, save artifacts
        (reference ``base_adaptor.py:136-189`` + Saver test tree).
        ``tasks_per_label`` overrides the per-speaker episode count
        (reference default 16/speaker).

        ``task_batch`` (or ``train.test_task_batch``; "auto" = device
        count) adapts that many episodes CONCURRENTLY via
        ``System.test_adapt_batched`` — vmapped trajectories, episode axis
        sharded ``P("dp")`` on a multi-chip mesh.  The reference's DDP test
        runs one episode per GPU (``base_adaptor.py:151``); this is the
        SPMD equivalent.  1-shot mode keeps the sequential path (its
        sub-task loop already re-slices the support set)."""
        import math
        import jax as _jax
        from ..data.collate import collate_episode
        test_cfg = self.system.acfg["adapt"]["test"]
        tb = task_batch or self.tcfg.get("test_task_batch", 1)
        if tb == "auto":
            tb = max(1, len(_jax.devices()))
        if test_cfg.get("1-shot", False):
            tb = 1
        if tb > 1 and self.tcfg.get("distributed", "auto") != "off" \
                and self.system.mesh is None:
            n_use = math.gcd(len(_jax.devices()), int(tb))
            if n_use > 1:
                mesh = self.system.enable_mesh(n_use)
                print(f"[mesh] test stage: dp mesh over "
                      f"{mesh.devices.size} devices, {tb} tasks/batch")
        if test_cfg.get("avg_train_spk_emb") and \
                "speaker_emb" in self.system.params and \
                "table" in self.system.params["speaker_emb"]:
            # overwrite unseen-speaker rows with the mean train embedding
            # (reference on_test_start, system.py:195-213)
            from .checkpoint import average_speaker_rows
            train_rows = sorted({self.dm.train_set[i]["speaker"]
                                 for i in range(len(self.dm.train_set))})
            self.system.params = average_speaker_rows(
                self.system.params, train_rows)
            print(f"[test] avg_train_spk_emb over {len(train_rows)} rows")
        results = {}
        episodes = (self.dm.test_episodes(tasks_per_label)
                    if tasks_per_label else self.dm.test_episodes())

        def run_sequential(i, sup, qry):
            task_id = f"test_{i:03d}"
            sup_b, qry_b, _, qry_meta = collate_episode([sup], [qry])
            sup_e, qry_e = _first_episode(sup_b), _first_episode(qry_b)
            # 1-shot mode yields one independent trajectory per support
            # utterance (suffix _<k>); standard mode yields one ("", ...)
            for suffix, rows, snapshots in \
                    self.system.test_adapt_tasks(sup_e, qry_e):
                tid = task_id + suffix
                self.saver.log_task_csv("Testing", tid, rows,
                                        ckpt_step=ckpt_step)
                if self.vocoder is not None:
                    self._save_test_audio(tid, snapshots, sup_e, qry_e,
                                          qry_meta[0], ckpt_step)
                results[tid] = rows

        def run_batched(buf):
            import jax
            import numpy as np
            from ..models.loss import LossValues
            idxs = [b[0] for b in buf]
            sup_b, qry_b, _, qry_meta = collate_episode(
                [b[1] for b in buf], [b[2] for b in buf])
            rows_E, snaps_E = self.system.test_adapt_batched(sup_b, qry_b)

            # slice one episode out of a stacked pytree in ONE compiled
            # program: per-leaf x[e] would dispatch hundreds of tiny slice
            # ops per snapshot per episode through the remote tunnel (and
            # gather P("dp")-sharded leaves leaf-by-leaf on a mesh)
            jit_slice = self.system._cached_jit(
                "episode_slice",
                lambda tree, e: jax.tree.map(lambda x: x[e], tree))

            def slice_ep(tree, e):
                if isinstance(jax.tree.leaves(tree)[0], jax.Array):
                    return jit_slice(tree, e)
                return jax.tree.map(lambda x: x[e], tree)  # host-offloaded

            for e, i in enumerate(idxs):
                tid = f"test_{i:03d}"
                rows = [(ft, LossValues(*[float(np.asarray(v)[e])
                                          for v in vals]))
                        for ft, vals in rows_E]
                snapshots = [(ft, slice_ep(snap, e)) for ft, snap in snaps_E]
                self.saver.log_task_csv("Testing", tid, rows,
                                        ckpt_step=ckpt_step)
                if self.vocoder is not None:
                    sup_e = slice_ep(sup_b, e)
                    qry_e = slice_ep(qry_b, e)
                    self._save_test_audio(tid, snapshots, sup_e, qry_e,
                                          qry_meta[e], ckpt_step)
                results[tid] = rows

        buf = []
        for i, (desc, (sup, qry)) in enumerate(episodes):
            if max_tasks and i >= max_tasks:
                break
            if tb <= 1:
                run_sequential(i, sup, qry)
                continue
            buf.append((i, sup, qry))
            if len(buf) == tb:
                run_batched(buf)
                buf = []
        if buf:
            # remainder: one smaller batched program (compiles once per
            # remainder size) — or the sequential path for a single task
            if len(buf) == 1:
                run_sequential(*buf[0])
            else:
                run_batched(buf)
        return results

    def _save_test_audio(self, task_id, snapshots, sup, qry, qry_meta,
                         ckpt_step):
        """Per-task test audio at EVERY adaptation saving step (reference
        Saver test tree, ``saver.py:130-194``): ``*.recon.wav`` teacher-forced
        from the un-adapted (step 0) params, and
        ``*.step_<ckpt>-FTstep_<n>.synth.wav`` fully predicted from each
        snapshot — the per-step synth wavs the EER-vs-adaptation-steps
        evaluation is computed from."""
        import jax
        import numpy as np
        hop = self.system.pcfg["preprocessing"]["stft"]["hop_length"]
        qry_c = qry._replace(speaker_args=jax.tree.map(
            lambda x: x, sup.speaker_args)
            if isinstance(sup.speaker_args, tuple) else
            sup.speaker_args[:1].repeat(qry.texts.shape[0], axis=0))

        # jit per teacher-forced mode (eager forwards dispatch op-by-op,
        # which is pathological through the remote-TPU tunnel); synthesis is
        # pure inference so it opts into the fused FFT-block megakernel
        infer_mcfg = {**self.system.mcfg, "_fused_infer": True}

        def vocode_and_save(params, tag, teacher):
            from .synth_utils import prepare_tracks
            fwd = self.system._cached_jit(
                f"test_synth_tf{int(teacher)}",
                lambda p, st, b, t=teacher: self.system.adaptor.forward(
                    p, st, b, train=False, teacher_forced=t,
                    average_spk_emb=True, mcfg=infer_mcfg)[0])
            out = fwd(params, self.system.state, qry_c)
            mel_lens = np.asarray(out.mel_lens)
            wavs = self.vocoder.infer(out.postnet_mel,
                                      lengths=mel_lens * hop)
            for j, w in enumerate(wavs):
                if len(w) == 0:
                    continue
                name = f"{qry_meta.ids[j]}.{tag}"
                path = self.saver.save_audio("Testing", task_id, name, w,
                                             ckpt_step=ckpt_step)
                self.logger.log_artifact(0, "audio", path)
                # spectrogram + pitch/energy figure per saving step
                # (reference test figure tree, saver.py:130-194)
                mel, pitch, energy = prepare_tracks(
                    out, self.system.stats, self.system.pcfg, index=j)
                fig = self.saver.save_track_figure(
                    "Testing", task_id, name, mel, pitch, energy,
                    ckpt_step=ckpt_step)
                self.logger.log_artifact(0, "figure", fig)

        # teacher-forced reconstruction once, from the un-adapted params
        # (reference recon_samples at ft_step == 0, saver.py:158-165)
        vocode_and_save(snapshots[0][1], "recon", teacher=True)
        for ft_step, params in snapshots:
            vocode_and_save(params,
                            f"step_{ckpt_step}-FTstep_{ft_step}.synth",
                            teacher=False)

    # --------------------------------------------------- in-loop synthesis

    def synth_sample(self, step, batch, episode_batched=False):
        """Every synth_step: reconstruct + synthesize one training sample
        through the vocoder (reference Saver, ``saver.py:51-59,214-274``)."""
        import jax
        import numpy as np

        if episode_batched:
            batch = _first_episode(batch)
        one = jax.tree.map(lambda x: x[:1], batch)
        # jitted: eager forwards dispatch op-by-op through the TPU tunnel
        recon_fn = self.system._cached_jit(
            "synth_sample_recon",
            lambda p, st, b: self.system.adaptor.forward(
                p, st, b, train=False)[0])
        synth_fn = self.system._cached_jit(
            "synth_sample_pred",
            lambda p, st, b: self.system.adaptor.forward(
                p, st, b, train=False, teacher_forced=False)[0])
        recon_out = recon_fn(self.system.params, self.system.state, one)
        synth_out = synth_fn(self.system.params, self.system.state, one)
        hop = self.system.pcfg["preprocessing"]["stft"]["hop_length"]
        for tag, out in (("recon", recon_out), ("synth", synth_out)):
            mel_len = int(np.asarray(out.mel_lens)[0])
            if mel_len <= 0:
                continue
            wav = self.vocoder.infer(out.postnet_mel[:, :mel_len],
                                     lengths=[mel_len * hop])[0]
            path = self.saver.save_audio("Training", f"step_{step}",
                                         f"sample.{tag}", wav)
            self.logger.log_artifact(step, "audio", path)
            fig = self.saver.save_mel_figure(
                "Training", f"step_{step}", f"sample.{tag}",
                np.asarray(out.postnet_mel[0, :mel_len]))
            self.logger.log_artifact(step, "figure", fig)
