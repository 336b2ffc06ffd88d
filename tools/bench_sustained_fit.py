"""Sustained ``Trainer.fit`` benchmark at flagship shapes.

``bench.py`` times the ISOLATED second-order meta step on device-resident
batches (152 ms / 88k mel-frames/s on a v5e chip, round 4).  This drives
the PRODUCTION path instead — ``main.py -s train`` over an on-disk
preprocessed corpus, with the episode sampler, collation, Prefetcher,
logging, validation cadence and checkpoint writes all live — and reports
how close the sustained step stays to the isolated one.  Reference: the
pl.Trainer loop IS the product surface (``/root/reference/main.py:57-64``).

The corpus is synthetic but written in the exact preprocessor artifact
layout (mel/pitch/energy/duration npy + metadata + stats.json +
speakers.json, ``preprocess/preprocessor.py``), at flagship shapes: 128
phones (one text bucket) and 800-896 mel frames (one mel bucket), matching
bench.py's L=128/T=896 program so the two numbers are directly comparable.
Sizes: 32 train + 8 val speakers x 12 utterances (~130 MB).

Run (real TPU):   python tools/bench_sustained_fit.py --steps 300
Smoke (CPU):      METATTS_PLATFORM=cpu python tools/bench_sustained_fit.py \
                      --steps 8 --dev
Writes <root>/sustained_fit.json and prints one JSON summary line.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# valid ARPAbet symbols (text/symbols.py table) — metadata stores phones in
# braces exactly like the reference's preprocessed corpora
PHONES = ("HH AH0 L OW1 K T S IY1 N D R EH1 M P B G F V W Y Z SH CH TH "
          "NG JH AA1 AE1 AO1 UW1 ER0 IH0").split()


def build_corpus(root, n_train_spk=32, n_val_spk=8, utts=12, L=128,
                 t_lo=800, t_hi=896, n_mels=80, seed=0):
    rng = np.random.RandomState(seed)
    for sub in ("mel", "pitch", "energy", "duration"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    speakers = [f"spk{i:03d}" for i in range(n_train_spk + n_val_spk)]
    with open(os.path.join(root, "speakers.json"), "w") as f:
        json.dump({s: i for i, s in enumerate(speakers)}, f)
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump({"pitch": [-4.0, 4.0, 0.0, 1.0],
                   "energy": [-4.0, 4.0, 0.0, 1.0]}, f)
    lines = {"train": [], "val": []}
    for si, spk in enumerate(speakers):
        split = "train" if si < n_train_spk else "val"
        for u in range(utts):
            base = f"{spk}_u{u:02d}"
            phones = rng.choice(PHONES, size=L)
            T = int(rng.randint(t_lo, t_hi + 1))
            d = np.ones(L, np.int64)
            d += np.bincount(rng.randint(0, L, size=T - L), minlength=L)
            mel = (rng.randn(T, n_mels) * 0.8).astype(np.float32)
            np.save(os.path.join(root, "mel", f"{spk}-mel-{base}.npy"), mel)
            np.save(os.path.join(root, "pitch", f"{spk}-pitch-{base}.npy"),
                    rng.randn(L).astype(np.float32))
            np.save(os.path.join(root, "energy", f"{spk}-energy-{base}.npy"),
                    rng.randn(L).astype(np.float32))
            np.save(os.path.join(root, "duration",
                                 f"{spk}-duration-{base}.npy"),
                    d.astype(np.int32))
            text = "{" + " ".join(phones) + "}"
            lines[split].append(f"{base}|{spk}|{text}|synthetic bench")
    for split, ls in lines.items():
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(ls) + "\n")
    return root


def write_configs(root, steps, dev=False, val_step=None, save_step=None):
    import yaml
    cfgd = os.path.join(root, "config")
    os.makedirs(cfgd, exist_ok=True)
    pre = {
        "dataset": "benchfit", "lang_id": 0,
        "path": {"raw_path": root, "preprocessed_path": root},
        "subsets": {"train": "train", "val": "val", "test": "val"},
    }
    val_step = val_step or max(steps // 2, 1)
    save_step = save_step or max(steps // 2, 1)
    train = {
        "optimizer": {"batch_size": 8, "grad_acc_step": 1},
        # val fires twice (8 val speakers x 4 tasks each, the val_episodes
        # default); checkpoint saves twice (step_N + last = 4 writes)
        "step": {"total_step": steps, "log_step": max(steps // 15, 1),
                 "synth_step": 0, "val_step": val_step,
                 "save_step": save_step},
    }
    algo = {
        "name": "bench_meta", "type": "meta",
        "adapt": {
            "type": "spk", "speaker_emb": "table",
            "modules": ["speaker_emb", "variance_adaptor", "decoder",
                        "mel_linear", "postnet"],
            "train": {"ways": 1, "shots": 5, "queries": 5, "lr": 0.001,
                      "steps": 5, "meta_batch_size": 1},
            "test": {"ways": 1, "shots": 5, "queries": 1, "lr": 0.001,
                     "steps": 10, "saving_steps": [5, 10]},
        },
    }
    paths = {}
    for name, cfg in (("preprocess", pre), ("train", train),
                      ("algorithm", algo)):
        p = os.path.join(cfgd, f"{name}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths[name] = p
    paths["model"] = os.path.join(
        REPO, "config", "model", "dev.yaml" if dev else "base.yaml")
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/bench_fit")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dev", action="store_true",
                    help="dev model config (CPU smoke)")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    if not args.skip_build or not os.path.exists(
            os.path.join(args.root, "train.txt")):
        print(f"[bench_fit] building corpus under {args.root} ...",
              flush=True)
        build_corpus(args.root)
    paths = write_configs(args.root, args.steps, dev=args.dev)

    cmd = [sys.executable, "-u", os.path.join(REPO, "main.py"), "-s", "train",
           "-p", paths["preprocess"], "-m", paths["model"],
           "-t", paths["train"], "-a", paths["algorithm"],
           "-e", "bench_fit", "--output_dir",
           os.path.join(args.root, "output"), "--no_synth"]
    print("[bench_fit]", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"fit failed rc={proc.returncode}")

    m = re.search(r"\[profile\] (\d+) steps: mean ([\d.]+)ms "
                  r"p50 ([\d.]+)ms p95 ([\d.]+)ms \(([\d.]+) it/s"
                  r"(?:, e2e ([\d.]+) it/s[^)]*)?\)", proc.stdout)
    if not m:
        raise SystemExit("no [profile] line in fit output")
    summary = {
        "metric": "sustained_fit_step_ms",
        "steps": args.steps,
        "profiled_steps": int(m.group(1)),
        "mean_ms": float(m.group(2)),
        "p50_ms": float(m.group(3)),
        "p95_ms": float(m.group(4)),
        "step_it_s": float(m.group(5)),
        "e2e_it_s": float(m.group(6)) if m.group(6) else None,
        "total_wall_s": round(wall, 1),
        "isolated_step_ms_r4": 151.4,  # BENCH_r04 flagship isolated step
    }
    with open(os.path.join(args.root, "sustained_fit.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
