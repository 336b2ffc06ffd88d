"""Secondary bench anchor: the SAME second-order MAML episode step, in
PyTorch, on this host's CPU — measured, not analytic.

The reference's published recipe has no throughput numbers and this image
has no GPU, so bench.py's `vs_baseline` is an ANALYTIC V100 estimate
(derivation in BASELINE.md).  This script hardens it with a measured
same-host comparison: a faithful torch implementation of the reference
compute graph (FFT-block FastSpeech2, ``/root/reference/transformer/``
shapes: hidden 256, 4 enc + 6 dec layers, conv-FFN k=[9,1], postnet 5x512)
runs one flagship episode (5-shot/5-query, T=896, 5 second-order inner SGD
steps via ``torch.autograd.grad(create_graph=True)`` — the learn2learn
mechanism, ``systems/utils.py:192-293``) and prints seconds/episode.

Run both on the same CPU for the ratio:
    METATTS_PLATFORM=cpu python bench.py          # ours (XLA CPU)
    python tools/bench_torch_cpu.py               # reference math (torch CPU)

Numbers recorded in BASELINE.md.
"""

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

D, HEADS, ENC_L, DEC_L, FFN, N_MELS = 256, 2, 4, 6, 1024, 80
SHOTS, QUERIES, SRC_LEN, MEL_LEN, INNER_STEPS = 5, 5, 128, 896, 5
INNER_LR = 1e-3


class FFTBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(D, 3 * D)
        self.out = nn.Linear(D, D)
        self.ln1 = nn.LayerNorm(D)
        self.w1 = nn.Conv1d(D, FFN, 9, padding=4)
        self.w2 = nn.Conv1d(FFN, D, 1)
        self.ln2 = nn.LayerNorm(D)

    def forward(self, x, pad):
        B, T, _ = x.shape
        q, k, v = self.qkv(x).reshape(B, T, 3, HEADS, D // HEADS).permute(
            2, 0, 3, 1, 4)
        s = q @ k.transpose(-1, -2) / np.sqrt(D // HEADS)
        s = s.masked_fill(pad[:, None, None, :], -1e9)
        a = torch.softmax(s, -1) @ v
        a = a.transpose(1, 2).reshape(B, T, D)
        x = self.ln1(self.out(a) + x).masked_fill(pad[..., None], 0.0)
        h = self.w2(torch.relu(self.w1(x.transpose(1, 2)))).transpose(1, 2)
        return self.ln2(h + x).masked_fill(pad[..., None], 0.0)


class RefFS2(nn.Module):
    """Reference-shaped FastSpeech2 compute graph (teacher-forced)."""

    def __init__(self, n_speakers=256):
        super().__init__()
        self.emb = nn.Embedding(361, D)
        self.spk = nn.Embedding(n_speakers, D)
        self.enc = nn.ModuleList(FFTBlock() for _ in range(ENC_L))
        self.dec = nn.ModuleList(FFTBlock() for _ in range(DEC_L))
        self.var_convs = nn.ModuleList(
            nn.Sequential(nn.Conv1d(D, D, 3, padding=1), nn.ReLU(),
                          nn.Conv1d(D, D, 3, padding=1), nn.ReLU())
            for _ in range(3))
        self.var_out = nn.ModuleList(nn.Linear(D, 1) for _ in range(3))
        self.p_emb = nn.Embedding(256, D)
        self.e_emb = nn.Embedding(256, D)
        self.mel_linear = nn.Linear(D, N_MELS)
        post = [nn.Conv1d(N_MELS, 512, 5, padding=2), nn.BatchNorm1d(512)]
        for _ in range(3):
            post += [nn.Conv1d(512, 512, 5, padding=2), nn.BatchNorm1d(512)]
        post += [nn.Conv1d(512, N_MELS, 5, padding=2)]
        self.postnet = nn.ModuleList(post)

    def forward(self, texts, spk_ids, d_tgt, p_ids, e_ids, mel_pad):
        B, L = texts.shape
        src_pad = torch.zeros(B, L, dtype=torch.bool)
        x = self.emb(texts)
        for blk in self.enc:
            x = blk(x, src_pad)
        x = x + self.spk(spk_ids)[:, None]
        for conv, out in zip(self.var_convs, self.var_out):
            _ = out(conv(x.transpose(1, 2)).transpose(1, 2))
        x = x + self.p_emb(p_ids) + self.e_emb(e_ids)
        # length regulation as gather (cumsum index map, matching frames)
        idx = torch.clamp(torch.repeat_interleave(
            torch.arange(L)[None].expand(B, L).reshape(-1),
            d_tgt.reshape(-1)).reshape(B, -1)[:, :MEL_LEN], max=L - 1)
        x = torch.gather(x, 1, idx[..., None].expand(-1, -1, D))
        x = x + self.spk(spk_ids)[:, None]
        for blk in self.dec:
            x = blk(x, mel_pad)
        mel = self.mel_linear(x)
        h = mel.transpose(1, 2)
        for i, m in enumerate(self.postnet):
            h = m(h)
            if isinstance(m, nn.BatchNorm1d) and i < len(self.postnet) - 1:
                h = torch.tanh(h)
        return mel, mel + h.transpose(1, 2)


def batch(rng, B):
    texts = torch.tensor(rng.randint(1, 360, (B, SRC_LEN)))
    spk = torch.tensor(rng.randint(0, 256, (B,)))
    d = torch.full((B, SRC_LEN), MEL_LEN // SRC_LEN)
    p = torch.tensor(rng.randint(0, 256, (B, SRC_LEN)))
    e = torch.tensor(rng.randint(0, 256, (B, SRC_LEN)))
    mel_pad = torch.zeros(B, MEL_LEN, dtype=torch.bool)
    tgt = torch.tensor(rng.randn(B, MEL_LEN, N_MELS).astype(np.float32))
    return (texts, spk, d, p, e, mel_pad), tgt


def episode_step(model, sup, sup_tgt, qry, qry_tgt):
    """Second-order MAML episode: 5 inner SGD steps with create_graph=True
    (learn2learn adapt_ semantics), query loss, outer backward."""
    params = [p for p in model.parameters()]
    fast = params
    for _ in range(INNER_STEPS):
        mel, post = _apply(model, fast, sup)
        loss = F.l1_loss(mel, sup_tgt) + F.l1_loss(post, sup_tgt)
        grads = torch.autograd.grad(loss, fast, create_graph=True,
                                    allow_unused=True)
        fast = [w - INNER_LR * g if g is not None else w
                for w, g in zip(fast, grads)]
    mel, post = _apply(model, fast, qry)
    outer = F.l1_loss(mel, qry_tgt) + F.l1_loss(post, qry_tgt)
    outer.backward()
    return float(outer)


def _apply(model, fast, inputs):
    """functional_call with the fast weights (copy_module equivalent)."""
    names = [n for n, _ in model.named_parameters()]
    return torch.func.functional_call(model, dict(zip(names, fast)), inputs)


def main():
    torch.manual_seed(0)
    import os as _os; torch.set_num_threads(_os.cpu_count() or 8)
    rng = np.random.RandomState(0)
    model = RefFS2()
    sup, sup_tgt = batch(rng, SHOTS)
    qry, qry_tgt = batch(rng, QUERIES)

    episode_step(model, sup, sup_tgt, qry, qry_tgt)   # warmup
    model.zero_grad()
    iters = 2
    t0 = time.time()
    for _ in range(iters):
        episode_step(model, sup, sup_tgt, qry, qry_tgt)
        model.zero_grad()
    dt = (time.time() - t0) / iters
    frames = SHOTS * MEL_LEN * INNER_STEPS + QUERIES * MEL_LEN
    print(json.dumps({
        "metric": "torch_cpu_episode_step_s",
        "value": round(dt, 2),
        "frames_per_sec": round(frames / dt, 1),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
