"""Fetch + convert the external pretrained checkpoints this framework can
ingest (one command once network egress exists).

The reference relies on five external weight sets that are NOT in any
repo (reference call sites cited per item below).  This image is
egress-blocked, so every run so far is random-init and clearly labeled
(UNCALIBRATED tags, Vocoder warnings).  On a machine with network access:

    python tools/fetch_weights.py --dest weights/           # all
    python tools/fetch_weights.py --only melgan ge2e        # subset

downloads the official checkpoints and converts each into this
framework's npz layout with tools/convert_torch_weights.py; the printed
config/CLI lines are then a pure file drop:

    model.vocoder.weights_npz: weights/melgan.npz
    evaluate.py --dvector-weights weights/ge2e.npz \
                --mosnet-weights weights/mosnet.npz \
                --mbnet-weights weights/mbnet.npz \
                --wav2vec2-weights weights/wav2vec2.npz

URLs point at the official hosts; they are recorded here as documentation
and cannot be verified from this image — check the upstream repos if one
moves.  HiFi-GAN v1 (jik876) is distributed via Google Drive and must be
downloaded by hand (see its entry).
"""

import argparse
import os
import sys
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))

# name -> (url or None, filename, converter kind, notes)
SOURCES = {
    # reference lightning/utils.py:10-13: torch.hub
    # descriptinc/melgan-neurips "multi_speaker" — the hub entry resolves to
    # the linda_johnson/multi_speaker ckpt on the repo's release storage.
    "melgan": (
        "https://github.com/descriptinc/melgan-neurips/raw/master/"
        "models/multi_speaker.pt",
        "melgan_multi_speaker.pt", "melgan",
        "fallback: torch.hub.load('descriptinc/melgan-neurips', "
        "'load_melgan', 'multi_speaker') then save "
        "vocoder.mel2wav.state_dict()"),
    # reference lightning/model/speaker_encoder.py:10-23 + evaluation/*:
    # resemblyzer VoiceEncoder ships its checkpoint inside the pip package.
    "ge2e": (
        "https://github.com/resemble-ai/Resemblyzer/raw/master/"
        "resemblyzer/pretrained.pt",
        "ge2e_pretrained.pt", "ge2e", None),
    # reference evaluation/compute_mos.py:25: speechmetrics loads the
    # official MOSNet Keras checkpoint (Lo et al. 2019).
    "mosnet": (
        "https://github.com/lochenchou/MOSNet/raw/master/pre_trained/"
        "cnn_blstm.h5",
        "cnn_blstm.h5", "mosnet", None),
    # reference evaluation/compute_mos.py:144-166: Pytorch_MBNet pretrained.
    "mbnet": (
        "https://github.com/sky1456723/Pytorch-MBNet/raw/main/pre_trained/"
        "model-50000.pt",
        "mbnet_model-50000.pt", "mbnet", None),
    # reference evaluation/compute_mos.py:205,320: the SSL pseudo-MOS
    # family builds on facebook/wav2vec2-base (HF hosting; the converter
    # also ingests a dir from transformers save_pretrained or an SSL-MOS
    # finetune whose state dict carries a (1, H) regression head).
    "wav2vec2": (
        "https://huggingface.co/facebook/wav2vec2-base/resolve/main/"
        "pytorch_model.bin",
        "wav2vec2_base.bin", "wav2vec2",
        "also fetch config.json next to it, or pass the model dir; "
        "fallback: transformers save_pretrained('facebook/wav2vec2-base')"),
    # utils/model.py:38 HiFi-GAN option: jik876/hifi-gan generator v1 is
    # Google-Drive hosted (no stable direct URL) — manual download.
    "hifigan": (
        None, "g_02500000", "hifigan",
        "download 'generator_v1' from the jik876/hifi-gan README Drive "
        "folder, place it at <dest>/g_02500000, rerun this script"),
}


def fetch(name, dest):
    url, fname, kind, note = SOURCES[name]
    raw = os.path.join(dest, fname)
    if not os.path.exists(raw):
        if url is None:
            print(f"[{name}] no direct URL — {note}")
            return False
        print(f"[{name}] downloading {url}")
        try:
            urllib.request.urlretrieve(url, raw + ".part")
            os.replace(raw + ".part", raw)
        except Exception as e:
            print(f"[{name}] download failed ({e}); "
                  + (note or "fetch it by hand and rerun"))
            return False
    out = os.path.join(dest, f"{name}.npz")
    if os.path.exists(out):
        print(f"[{name}] already converted: {out}")
        return True
    import subprocess
    r = subprocess.run([sys.executable,
                        os.path.join(HERE, "convert_torch_weights.py"),
                        kind, raw, out])
    if r.returncode != 0:
        print(f"[{name}] conversion failed (rc={r.returncode})")
        return False
    print(f"[{name}] ready: {out}")
    return True


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dest", default="weights")
    ap.add_argument("--only", nargs="*", choices=sorted(SOURCES),
                    default=None)
    args = ap.parse_args()
    os.makedirs(args.dest, exist_ok=True)
    names = args.only or sorted(SOURCES)
    ok = {n: fetch(n, args.dest) for n in names}
    print()
    for n, good in ok.items():
        print(f"  {n:8s} {'OK' if good else 'MISSING'}")
    if ok.get("melgan"):
        print(f"\nset model.vocoder.weights_npz: {args.dest}/melgan.npz")
    if ok.get("ge2e"):
        print(f"evaluate.py --dvector-weights {args.dest}/ge2e.npz")


if __name__ == "__main__":
    main()
