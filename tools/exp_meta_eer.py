"""EER-vs-adaptation-steps meta advantage — the reference's headline
artifact, in its own currency.

The reference's core result table is speaker-verification EER vs adaptation
step (``/root/reference/evaluation/txt/LibriTTS/eer.txt``: meta 0.1776 vs
baseline 0.4309 at step 10), produced by the pipeline synthesize wavs ->
d-vectors -> same/diff-speaker pairs -> EER
(``evaluation/wavs_to_dvector.py:18``, ``speaker_verification.py:20``).
Round 4 proved the advantage in query-LOSS space only
(``tools/exp_meta_advantage.py``); this experiment closes the loop through
actual audio with zero external weights:

1. train MetaSystem vs BaselineSystem on the synthetic corpus (identical
   init / utterance budget / optimizer — ``run_experiment``);
2. synthesize WAVS per adaptation saving step for held-out-speaker test
   episodes: snapshot params -> FastSpeech2 synthesis forward (predicted
   durations) -> Griffin-Lim pseudo-vocoder
   (``data/synthetic.SyntheticMelVocoder``), written in the Saver result
   tree layout (``*.step_last-FTstep_<n>.synth.wav``);
3. train a SCRATCH GE2E verifier (``evaluation/ge2e_scratch.py``) on
   Griffin-Lim audio of the TRAIN speakers only — the held-out speakers
   are unseen by model AND verifier, exactly like resemblyzer never saw
   LibriTTS test-clean;
4. run the STANDARD evaluation stack (``evaluate.run_matrix`` — the same
   code path the reference-parity eval matrix uses) over real/recon/synth
   wavs to produce an ``eer.txt`` analogue + EER-vs-step curves.

Run:  METATTS_PLATFORM=cpu python tools/exp_meta_eer.py
      (writes examples/meta_advantage_eer/{eer.txt,results.json,
       eer_vs_step.png,...})

``run_eer_experiment`` is importable; ``tests/test_meta_eer.py`` runs a
reduced configuration and asserts the EER ordering at step 10.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _write_speaker_wavs(voc, corpus, speakers, n_utts, rng, out_dir):
    """Ground-truth utterances -> Griffin-Lim wavs under
    <out_dir>/<speaker>/<utt>.wav (the evaluation `--real` layout)."""
    from metatts_tpu.preprocess.audio_io import save_wav
    for s in speakers:
        batch = corpus.batch([s] * n_utts, rng)
        wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
        d = os.path.join(out_dir, str(int(s)))
        os.makedirs(d, exist_ok=True)
        for j, w in enumerate(wavs):
            save_wav(os.path.join(d, f"utt{j:03d}.wav"), w, voc.sr)


def _synthesize_result_tree(system, voc, episodes, out_root, log_root,
                            episode_speakers, verbose=True):
    """Per-episode test adaptation + per-saving-step synthesis into the
    Saver test-tree layout ``<out_root>/audio/Testing/step_last/test_NNN/``
    (reference ``saver.py:130-194``), plus the frozen episode descriptions
    the evaluation uses for task->speaker regrouping."""
    import jax
    from metatts_tpu.preprocess.audio_io import save_wav

    infer_mcfg = {**system.mcfg, "_fused_infer": True}

    def synth_fwd(params, state, qry_c, teacher):
        out, _ = system.adaptor.forward(params, state, qry_c, train=False,
                                        teacher_forced=teacher,
                                        average_spk_emb=True,
                                        mcfg=infer_mcfg)
        return out

    fwd_synth = system._cached_jit(
        "eer_synth", lambda p, st, b: synth_fwd(p, st, b, False))
    fwd_recon = system._cached_jit(
        "eer_recon", lambda p, st, b: synth_fwd(p, st, b, True))

    t0 = time.time()
    for i, (sup, qry) in enumerate(episodes):
        rows, snapshots = system.test_adapt(sup, qry)
        qry_c = qry._replace(speaker_args=sup.speaker_args[:1].repeat(
            qry.texts.shape[0], axis=0))
        task_dir = os.path.join(out_root, "audio", "Testing", "step_last",
                                f"test_{i:03d}")
        os.makedirs(task_dir, exist_ok=True)
        # teacher-forced reconstruction from the un-adapted params
        out = fwd_recon(snapshots[0][1], system.state, qry_c)
        for j, w in enumerate(voc(np.asarray(out.postnet_mel),
                                  np.asarray(out.mel_lens))):
            save_wav(os.path.join(task_dir, f"qry{j:02d}.recon.wav"),
                     w, voc.sr)
        # fully predicted synthesis from every snapshot
        for ft, params in snapshots:
            out = fwd_synth(params, system.state, qry_c)
            for j, w in enumerate(voc(np.asarray(out.postnet_mel),
                                      np.asarray(out.mel_lens))):
                save_wav(os.path.join(
                    task_dir,
                    f"qry{j:02d}.step_last-FTstep_{ft}.synth.wav"),
                    w, voc.sr)
        if verbose and (i % 4 == 0 or i == len(episodes) - 1):
            print(f"[synth] task {i + 1}/{len(episodes)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    os.makedirs(log_root, exist_ok=True)
    with open(os.path.join(log_root, "test_descriptions.json"), "w") as f:
        json.dump([{"label": f"syn-spk_{s}"} for s in episode_speakers], f)


def run_eer_experiment(out_dir="examples/meta_advantage_eer",
                       outer_steps=400, n_train=32, n_test=8, n_mels=8,
                       hidden=32, layers=1, seed=0,
                       saving_steps=(5, 10, 20, 50, 100),
                       episodes_per_speaker=2, eval_queries=8,
                       ge2e_hidden=128, ge2e_steps=300, ge2e_utts=16,
                       ge2e_spk_per_batch=8, ge2e_utt_per_spk=4,
                       enroll_utts=12, gl_iters=24, verbose=True,
                       algorithms=("meta", "baseline")):
    """Full pipeline; returns {"eer_table": {system: {ft: eer}}, ...}."""
    from exp_meta_advantage import run_experiment
    from metatts_tpu.data.synthetic import SyntheticMelVocoder
    from metatts_tpu.evaluation.ge2e_scratch import (
        train_ge2e, save_ge2e_npz, utterance_partial)

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # ---- 1. train both systems + loss-space test stage ------------------
    out = run_experiment(
        outer_steps=outer_steps, n_train=n_train, n_test=n_test,
        n_mels=n_mels, hidden=hidden, layers=layers, seed=seed,
        saving_steps=saving_steps,
        episodes_per_speaker=episodes_per_speaker,
        eval_queries=eval_queries, verbose=verbose,
        algorithms=algorithms, keep_systems=True)
    systems = out.pop("_systems")
    corpus = out.pop("_corpus")
    episodes = out.pop("_episodes")
    episode_speakers = out.pop("_episode_speakers")
    train_speakers = out.pop("_train_speakers")
    test_speakers = out.pop("_test_speakers")

    # persist the trained systems immediately: training is ~2 h of the
    # pipeline's wall time and the downstream stages (GE2E / synthesis /
    # evaluation) must be re-runnable without retraining if one fails
    from metatts_tpu.train.checkpoint import save_checkpoint
    for name, system in systems.items():
        save_checkpoint(os.path.join(out_dir, f"ckpt_{name}.msgpack"),
                        system.params, system.state, system.opt_state,
                        getattr(system, "global_step", 0))

    with open(os.path.join(out_dir, "loss_results.json"), "w") as f:
        json.dump({k: v for k, v in out.items() if not k.startswith("_")},
                  f, indent=1)

    voc = SyntheticMelVocoder(n_mels=n_mels, n_iters=gl_iters, seed=seed)

    # ---- 2. real (enrollment) wavs for the held-out speakers ------------
    wav_rng = np.random.RandomState(seed + 11)
    real_dir = os.path.join(out_dir, "real")
    if verbose:
        print("[eer] writing enrollment wavs...", flush=True)
    _write_speaker_wavs(voc, corpus, test_speakers, enroll_utts, wav_rng,
                        real_dir)

    # ---- 3. scratch GE2E verifier on TRAIN speakers only ----------------
    ge2e_npz = os.path.join(out_dir, "ge2e_scratch.npz")
    if verbose:
        print("[eer] building GE2E training corpus "
              f"({len(train_speakers)} spk x {ge2e_utts} utts)...",
              flush=True)
    partials = {}
    for s in train_speakers:
        batch = corpus.batch([s] * ge2e_utts, wav_rng)
        wavs = voc(np.asarray(batch.mels), np.asarray(batch.mel_lens))
        partials[int(s)] = np.stack(
            [utterance_partial(w, voc.sr) for w in wavs])
    ge2e_params, ge2e_trace = train_ge2e(
        partials, hidden=ge2e_hidden, embed=ge2e_hidden,
        steps=ge2e_steps, n_speakers_per_batch=ge2e_spk_per_batch,
        m_utts_per_speaker=ge2e_utt_per_spk, seed=seed,
        verbose=verbose)
    save_ge2e_npz(ge2e_params, ge2e_npz)
    if verbose:
        print(f"[eer] GE2E loss {ge2e_trace[0]:.3f} -> {ge2e_trace[-1]:.3f}",
              flush=True)

    # ---- 4. per-system result trees --------------------------------------
    for name, system in systems.items():
        if verbose:
            print(f"[eer] synthesizing {name} result tree...", flush=True)
        _synthesize_result_tree(
            system, voc, episodes,
            os.path.join(out_dir, "result", name),
            os.path.join(out_dir, "log", name),
            episode_speakers, verbose=verbose)

    # ---- 5. the standard evaluation stack -------------------------------
    matrix = {
        "corpus": "synthetic",
        "real_dir": real_dir,
        "n_sample": max(enroll_utts, eval_queries),
        "step_list": ["step_last"],
        "ft_step_list": [0] + list(saving_steps),
        "modes": {name: os.path.join(out_dir, "result", name)
                  for name in systems},
    }
    matrix_path = os.path.join(out_dir, "matrix.yaml")
    import yaml
    with open(matrix_path, "w") as f:
        yaml.safe_dump(matrix, f)

    import evaluate as evaluate_cli
    eval_args = argparse.Namespace(
        config=matrix_path, out=os.path.join(out_dir, "eval"),
        dvector_weights=ge2e_npz, mosnet_weights=None, mbnet_weights=None,
        wav2vec2_weights=None, mos=False)
    evaluate_cli.run_matrix(eval_args)

    # ---- 6. table + figure ----------------------------------------------
    eer_rows = {}
    with open(os.path.join(out_dir, "eval", "eer.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                eer_rows[parts[0]] = float(parts[1])
    table = {name: {} for name in systems}
    for name in systems:
        for ft in [0] + list(saving_steps):
            key = f"{name}_synth_step_last_FTstep{ft}"
            if key in eer_rows:
                table[name][ft] = eer_rows[key]
    recon = {name: eer_rows.get(f"{name}_recon_step_last")
             for name in systems}
    result = {
        "eer_table": table,
        "real_eer": eer_rows.get("real"),
        "recon_eer": recon,
        "loss_summary": out["summary"],
        "ge2e": {"best_loss": float(min(v for v in ge2e_trace
                                        if np.isfinite(v))),
                 "final_loss": ge2e_trace[-1], "hidden": ge2e_hidden,
                 "steps": ge2e_steps, "calibration": "scratch-trained on "
                 "synthetic-corpus train split (no external weights)"},
        "config": {**out["config"], "enroll_utts": enroll_utts,
                   "ge2e_utts": ge2e_utts, "gl_iters": gl_iters,
                   "wall_s": round(time.time() - t0, 1)},
    }
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(result, f, indent=1)
    plot_eer(result, out_dir)
    if verbose:
        m10 = table.get("meta", {}).get(10)
        b10 = table.get("baseline", {}).get(10)
        print(f"[headline] EER @ 10 adaptation steps: meta {m10} vs "
              f"baseline {b10} (real {result['real_eer']}; reference "
              f"eer.txt: meta 0.1776 vs baseline 0.4309)")
    return result


def rescore(out_dir="examples/meta_advantage_eer", verbose=True):
    """Replay ONLY the evaluation + reporting stages (5-6) against the
    on-disk artifacts of a previous full run: matrix.yaml + result trees +
    ge2e_scratch.npz + real/.  Exists because evaluation-stage bugs (e.g.
    the mode-cache collision fixed in harness.embed_result_tree) must be
    re-scoreable without repeating the ~2 h train+synth pipeline."""
    import yaml

    matrix_path = os.path.join(out_dir, "matrix.yaml")
    cfg = yaml.safe_load(open(matrix_path))
    prev = json.load(open(os.path.join(out_dir, "results.json")))
    names = list(cfg["modes"])
    ge2e_npz = os.path.join(out_dir, "ge2e_scratch.npz")

    import evaluate as evaluate_cli
    eval_args = argparse.Namespace(
        config=matrix_path, out=os.path.join(out_dir, "eval"),
        dvector_weights=ge2e_npz, mosnet_weights=None, mbnet_weights=None,
        wav2vec2_weights=None, mos=False)
    evaluate_cli.run_matrix(eval_args)

    eer_rows = {}
    with open(os.path.join(out_dir, "eval", "eer.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                eer_rows[parts[0]] = float(parts[1])
    table = {name: {} for name in names}
    for name in names:
        for ft in cfg["ft_step_list"]:
            key = f"{name}_synth_step_last_FTstep{ft}"
            if key in eer_rows:
                table[name][ft] = eer_rows[key]
    result = dict(prev)
    result["eer_table"] = table
    result["real_eer"] = eer_rows.get("real")
    result["recon_eer"] = {name: eer_rows.get(f"{name}_recon_step_last")
                           for name in names}
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(result, f, indent=1)
    plot_eer(result, out_dir)
    if verbose:
        m10 = table.get("meta", {}).get(10)
        b10 = table.get("baseline", {}).get(10)
        print(f"[headline] EER @ 10 adaptation steps: meta {m10} vs "
              f"baseline {b10} (real {result['real_eer']}; reference "
              f"eer.txt: meta 0.1776 vs baseline 0.4309)")
    return result


def plot_eer(result, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.5, 4.5))
    colors = {"meta": "tab:blue", "baseline": "tab:orange",
              "imaml": "tab:green"}
    for name, steps in result["eer_table"].items():
        fts = sorted(steps)
        ax.plot(fts, [steps[f] for f in fts], "-o",
                color=colors.get(name, "tab:gray"), label=name)
    if result.get("real_eer") is not None:
        ax.axhline(result["real_eer"], color="k", ls="--", lw=1,
                   label=f"real ({result['real_eer']:.3f})")
    ax.axhline(0.5, color="gray", ls=":", lw=1, label="chance")
    ax.set_xlabel("adaptation step (held-out speakers)")
    ax.set_ylabel("speaker-verification EER")
    ax.set_title("EER vs adaptation steps (scratch GE2E verifier)")
    ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "eer_vs_step.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer-steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ge2e-steps", type=int, default=300)
    ap.add_argument("--ge2e-hidden", type=int, default=128)
    ap.add_argument("--with-imaml", action="store_true")
    ap.add_argument("--rescore", action="store_true",
                    help="re-run only evaluation+reporting on the "
                         "artifacts of a previous full run")
    ap.add_argument("--out", default="examples/meta_advantage_eer")
    args = ap.parse_args()

    if os.environ.get("METATTS_PLATFORM", "cpu") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from metatts_tpu.utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()

    if args.rescore:
        rescore(out_dir=args.out)
        return

    algorithms = (("meta", "imaml", "baseline") if args.with_imaml
                  else ("meta", "baseline"))
    run_eer_experiment(out_dir=args.out, outer_steps=args.outer_steps,
                       seed=args.seed, ge2e_steps=args.ge2e_steps,
                       ge2e_hidden=args.ge2e_hidden, algorithms=algorithms)


if __name__ == "__main__":
    main()
