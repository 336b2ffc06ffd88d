"""CLI entry: same surface as the reference ``main.py:142-196``.

    python main.py -s {train,test,predict,debug}
                   -p <preprocess.yaml>... -m <model.yaml>
                   -t <train.yaml>... -a <algorithm.yaml>
                   [-e exp_name] [-c ckpt_path] [--max_steps N]

Stages:
  train   — fit the selected system (baseline / meta / imaml)
  test    — few-shot adaptation + synthesis over frozen test episodes
  predict — synthesize from a TextDataset source file
  debug   — iterate the test data once to validate plumbing
"""

import argparse
import json
import os


def build(configs, log_dir="."):
    preprocess_cfgs, model_cfg, train_cfg, algorithm_cfg = configs
    from metatts_tpu.algorithms import get_system
    from metatts_tpu.data import get_datamodule

    stats_path = os.path.join(
        preprocess_cfgs[0]["path"]["preprocessed_path"], "stats.json")
    stats = None
    if os.path.exists(stats_path):
        stats = json.load(open(stats_path))
    speakers_path = os.path.join(
        preprocess_cfgs[0]["path"]["preprocessed_path"], "speakers.json")
    n_speakers = 8
    if os.path.exists(speakers_path):
        n_speakers = max(len(json.load(open(speakers_path))), 1)

    spk_refer_wav = algorithm_cfg["adapt"]["speaker_emb"] in (
        "encoder", "dvec", "scratch_encoder")
    dm = get_datamodule(algorithm_cfg["type"])(
        preprocess_cfgs, train_cfg, algorithm_cfg, log_dir=log_dir,
        spk_refer_wav=spk_refer_wav)
    system = get_system(algorithm_cfg["type"])(
        preprocess_cfgs, model_cfg, train_cfg, algorithm_cfg,
        stats=stats, n_speakers=n_speakers)
    return system, dm


def main(args, configs):
    from metatts_tpu.train.loop import Trainer

    # frozen episode descriptions ({val,test}_descriptions.json) persist in
    # the experiment log dir (reference writes them to its log_dir too)
    log_dir = os.path.join(args.output_dir, "log", args.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    system, dm = build(configs, log_dir=log_dir)
    dm.setup()
    vocoder = None
    if args.stage in ("train", "test") and not args.no_synth:
        from metatts_tpu.models.vocoder import Vocoder
        vocoder = Vocoder(configs[1], n_mels=configs[0][0][
            "preprocessing"]["mel"]["n_mel_channels"])
    trainer = Trainer(system, dm, configs[2],
                      output_dir=args.output_dir, exp_name=args.exp_name,
                      vocoder=vocoder)

    if args.stage in ("test", "predict") and args.ckpt_path:
        from metatts_tpu.train.checkpoint import load_checkpoint
        p, st, opt, step, rep = load_checkpoint(
            args.ckpt_path, system.params, system.state,
            system.opt_state)
        system.params, system.state = p, st
        for r in rep:
            print(f"[ckpt surgery] {r}")

    if args.stage == "train":
        trainer.fit(resume_from=args.ckpt_path, max_steps=args.max_steps)
    elif args.stage == "test":
        trainer.test(max_tasks=args.max_tasks,
                     tasks_per_label=args.tasks_per_label)
    elif args.stage == "debug":
        n = 0
        for i in range(len(dm.test_set)):
            _ = dm.test_set[i]
            n += 1
        print(f"debug: iterated {n} test samples OK")
    elif args.stage == "predict":
        predict(args, configs, system)
    else:
        raise ValueError(f"unknown stage {args.stage}")


def predict(args, configs, system, predict_batch=8):
    """Text-only synthesis through the vocoder.

    Jitted with static shapes: sources are grouped by bucketed text length
    and padded to a fixed batch size, so the whole stage dispatches O(1)
    compiled programs per (bucket, batch) shape — an eager per-op forward
    is pathological through the remote-TPU tunnel (the same reason every
    other synthesis path routes through ``_cached_jit``, train/loop.py).
    Reference: ``main.py:132-139`` synth loop."""
    import numpy as np
    from metatts_tpu.data import TextDataset
    from metatts_tpu.data.collate import (collate_batch, bucket_length,
                                          TEXT_BUCKET)
    from metatts_tpu.models.vocoder import Vocoder
    from metatts_tpu.train.saver import Saver

    if not args.source:
        raise SystemExit("predict requires --source <file.txt>")
    ds = TextDataset(args.source, configs[0][0])
    samples = [ds[i] for i in range(len(ds))]
    groups = {}
    for s in samples:
        groups.setdefault(bucket_length(len(s["text"]), TEXT_BUCKET),
                          []).append(s)

    infer_mcfg = {**system.mcfg, "_fused_infer": True}
    fwd = system._cached_jit(
        "predict_synth",
        lambda p, st, b: system.adaptor.forward(
            p, st, b, train=False, teacher_forced=False,
            mcfg=infer_mcfg)[0])
    vocoder = Vocoder(configs[1], n_mels=configs[0][0][
        "preprocessing"]["mel"]["n_mel_channels"])
    hop = configs[0][0]["preprocessing"]["stft"]["hop_length"]
    saver = Saver(os.path.join(args.output_dir, "log", args.exp_name),
                  os.path.join(args.output_dir, "result", args.exp_name))
    for L in sorted(groups):
        grp = groups[L]
        for i in range(0, len(grp), predict_batch):
            chunk = grp[i:i + predict_batch]
            n = len(chunk)
            # pad the batch axis to the fixed size (repeat the last sample)
            # so every dispatch reuses one compiled program per bucket
            padded = chunk + [chunk[-1]] * (predict_batch - n)
            batch, meta = collate_batch(padded, with_mels=False,
                                        fixed_text_len=L)
            out = fwd(system.params, system.state, batch)
            mel_lens = np.asarray(out.mel_lens)[:n]
            wavs = vocoder.infer(
                np.asarray(out.postnet_mel)[:n], lengths=mel_lens * hop)
            for j, w in enumerate(wavs):
                path = saver.save_audio("Prediction", "predict",
                                        meta.ids[j], w)
                print(f"wrote {path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--stage", type=str, default="train",
                        choices=["train", "test", "predict", "debug"])
    parser.add_argument("-p", "--preprocess_config", type=str, nargs="+",
                        default=["config/preprocess/miniLibriTTS.yaml"])
    parser.add_argument("-m", "--model_config", type=str,
                        default="config/model/dev.yaml")
    parser.add_argument("-t", "--train_config", type=str, nargs="+",
                        default=["config/train/base.yaml",
                                 "config/train/dev.yaml"])
    parser.add_argument("-a", "--algorithm_config", type=str,
                        default="config/algorithm/dev.yaml")
    parser.add_argument("-e", "--exp_name", type=str, default="dev")
    parser.add_argument("-c", "--ckpt_path", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default="output")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_tasks", type=int, default=None)
    parser.add_argument("--tasks_per_label", type=int, default=None,
                        help="test episodes per speaker (default 16, as in "
                             "the reference)")
    parser.add_argument("--source", type=str, default=None,
                        help="text source file for predict stage")
    parser.add_argument("--no_synth", action="store_true",
                        help="skip in-loop synth_step synthesis")
    args = parser.parse_args()

    # platform override (reference falls back to CPU when no GPU,
    # main.py:31-32); the axon sitecustomize pins JAX_PLATFORMS, so we go
    # through jax.config.
    plat = os.environ.get("METATTS_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    from metatts_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    from metatts_tpu import config as C
    configs = (
        C.load_preprocess_configs(args.preprocess_config),
        C.load_model_config(args.model_config),
        C.load_train_configs(args.train_config),
        C.load_algorithm_config(args.algorithm_config),
    )
    main(args, configs)
