import json
import os

import numpy as np

from metatts_tpu.utils.rng import seed_all, seed_everything
from metatts_tpu.train.logging import ExperimentLogger
from metatts_tpu.train.saver import Saver
from metatts_tpu.data.lang_episodes import (episode_phoneme_representation,
                                            split_disjoint_phonemes)
from metatts_tpu.evaluation.mos import score, available_scorers
from metatts_tpu.models.loss import LossValues


def test_seed_all_restores_state():
    np.random.seed(7)
    before = np.random.rand()
    np.random.seed(7)
    with seed_all(43):
        inner1 = np.random.rand()
    after = np.random.rand()
    with seed_all(43):
        inner2 = np.random.rand()
    assert inner1 == inner2          # frozen seed reproducible
    assert before == after           # outer stream untouched


def test_experiment_logger_jsonl(tmp_path):
    lg = ExperimentLogger(str(tmp_path), "t")
    lg.log_hyperparams({"model": {"a": 1}})
    lg.log_metrics(5, {"train/total": 1.5})
    lg.log_artifact(5, "audio", "/x.wav")
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["hyperparams", "metrics", "artifact"]
    assert lines[1]["metrics"]["train/total"] == 1.5


def test_saver_task_csv(tmp_path):
    s = Saver(str(tmp_path / "log"), str(tmp_path / "res"))
    rows = [(0, LossValues(*[np.float32(i) for i in range(6)])),
            (5, LossValues(*[np.float32(i + 1) for i in range(6)]))]
    path = s.log_task_csv("Testing", "test_000", rows)
    content = open(path).read().splitlines()
    assert content[0].startswith("ft_step,total,mel")
    assert content[1].startswith("0,0.0")
    assert content[2].startswith("5,1.0")


def test_episode_phoneme_representation():
    samples = [
        {"text": np.array([3, 4, 3]), "representation":
            np.array([[1., 0.], [0., 2.], [3., 0.]])},
        {"text": np.array([4]), "representation": np.array([[0., 4.]])},
    ]
    rep = episode_phoneme_representation(samples)
    assert rep.shape[1] == 2
    np.testing.assert_allclose(rep[3], [2.0, 0.0])   # mean of (1,0),(3,0)
    np.testing.assert_allclose(rep[4], [0.0, 3.0])   # mean of (0,2),(0,4)
    np.testing.assert_allclose(rep[0], 0.0)          # PAD row
    np.testing.assert_allclose(rep[7], 0.0)          # absent phoneme


def test_split_disjoint_phonemes():
    sup = [{"text": np.array([1, 2, 3])}]
    qry = [{"text": np.array([2, 3, 4])}]
    rng = np.random.RandomState(0)
    sup_masks, qry_masks = split_disjoint_phonemes(sup, qry, rng)
    kept_sup = set(sup[0]["text"][sup_masks[0]].tolist())
    kept_qry = set(qry[0]["text"][qry_masks[0]].tolist())
    assert not (kept_sup & kept_qry & {2, 3})  # shared phones disjoint


def test_mos_proxy_orders_tone_above_noise():
    assert "spectral_proxy" in available_scorers()
    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 220 * t)
    noise = np.random.RandomState(0).randn(sr) * 0.3
    assert score("spectral_proxy", tone, sr) > score("spectral_proxy",
                                                     noise, sr)
    try:
        score("mosnet", tone, sr)
        assert False, "mosnet should be unavailable"
    except KeyError:
        pass


def test_prefetcher_order_and_errors():
    from metatts_tpu.data.prefetch import Prefetcher

    pf = Prefetcher(iter(range(5)), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]

    def bad():
        yield 1
        raise RuntimeError("boom")

    pf = Prefetcher(bad())
    assert next(pf) == 1
    try:
        next(pf)
        assert False
    except RuntimeError as e:
        assert "boom" in str(e)


def test_split_batch():
    import jax.numpy as jnp
    from metatts_tpu.data.collate import split_batch
    from metatts_tpu.models.fastspeech2 import Batch
    b = Batch(speaker_args=jnp.arange(4),
              texts=jnp.arange(12).reshape(4, 3),
              src_lens=jnp.full((4,), 3))
    s = split_batch(b, [2, 0])
    assert s.texts.shape == (2, 3)
    assert int(s.speaker_args[0]) == 2 and int(s.speaker_args[1]) == 0


def test_assign_support_query_coverage():
    """Reference LanguageTaskCollate.split_sup_qry invariant
    (collate.py:252-277): every phoneme in a query utterance must also occur
    in a support utterance — the episode phoneme table is generated from
    support representations only."""
    from metatts_tpu.data.lang_episodes import assign_support_query
    pool = [
        {"text": np.array([1, 2, 3])},    # has 1 (unique) -> support
        {"text": np.array([2, 3, 4])},
        {"text": np.array([3, 4, 2])},
        {"text": np.array([4, 2, 5])},    # has 5 (unique) -> support
    ]
    sup_idx, qry_idx = assign_support_query(pool, shots=2, queries=2)
    assert sorted(sup_idx + qry_idx) == [0, 1, 2, 3]
    sup_phones = set()
    for i in sup_idx:
        sup_phones.update(int(p) for p in pool[i]["text"])
    for i in qry_idx:
        assert set(int(p) for p in pool[i]["text"]) <= sup_phones, \
            "query utterance carries a phoneme absent from support"


def test_lang_episode_batches_apply_coverage_split():
    """The datamodule's lang episode pipeline must re-split sup/qry with the
    coverage rule and build phn_ref from the NEW support set: every phoneme
    appearing in query texts has a nonzero phn_ref row."""
    from metatts_tpu.data.datamodule import MetaDataModule

    class _Sampler:
        def __init__(self):
            self.rng = np.random.RandomState(0)

        def _sample(self, phones):
            L = len(phones)
            return {
                "id": "u", "speaker": 0,
                "text": np.array(phones, np.int32), "raw_text": "x",
                "mel": self.rng.randn(3 * L, 8).astype(np.float32),
                "pitch": self.rng.randn(L).astype(np.float32),
                "energy": self.rng.randn(L).astype(np.float32),
                "duration": np.full(L, 3, np.int32),
                "representation": self.rng.randn(L, 8).astype(np.float32),
            }

        def sample_meta_batch(self, mb):
            # original split puts the unique-phoneme utterance (1,2,3) in
            # QUERY — the coverage rule must move it to support
            sup = [[self._sample([2, 3, 4]), self._sample([3, 4, 2])]]
            qry = [[self._sample([1, 2, 3]), self._sample([4, 2, 3])]]
            return sup, qry

    dm = MetaDataModule.__new__(MetaDataModule)
    dm.acfg = {"adapt": {"type": "lang",
                         "phoneme_emb": {"type": "codebook"}}}
    dm.max_seq_len = 64
    dm.train_sampler = _Sampler()
    item = next(dm.train_episode_batches(1))
    sup_b, qry_b, phn_ref = item[0], item[1], item[4]
    qry_phones = set(np.asarray(qry_b.texts).ravel().tolist()) - {0}
    sup_phones = set(np.asarray(sup_b.texts).ravel().tolist()) - {0}
    assert qry_phones <= sup_phones
    ref = np.asarray(phn_ref[0])
    for p in qry_phones:
        assert np.abs(ref[p]).sum() > 0, f"zero phn_ref row for phoneme {p}"


def test_is_tpu_recognizes_tunnel_platform(monkeypatch):
    """jax.default_backend() is the PLATFORM name — "axon" on the tunneled
    TPU, not "tpu".  is_tpu() must treat both as TPU and the host CPU as
    not-TPU (the gates it feeds: flash-attn auto, native conv1d, fused
    inference megakernel)."""
    import jax
    from metatts_tpu.utils import backend

    assert backend.is_tpu() is False          # tests force the CPU backend
    assert backend.is_cpu() is True
    for name in ("tpu", "axon"):
        monkeypatch.setattr(jax, "default_backend", lambda n=name: n)
        assert backend.is_tpu() is True


def test_collate_episode_ragged_dvec_slices():
    """spk_ref_mel_slices counts are ragged per utterance; collate_episode
    must share the max across the meta-batch (per-episode maxima disagree
    and the episode stack crashes — dvec/encoder meta training and the
    batched test stage both hit this)."""
    import numpy as np
    from metatts_tpu.data.collate import collate_episode

    rng = np.random.RandomState(0)

    def sample(i, n_slices):
        d = rng.randint(1, 4, size=(10,)).astype(np.int32)
        return {"id": f"u{i}", "speaker": 0, "raw_text": "x",
                "text": rng.randint(1, 360, size=(10,)).astype(np.int32),
                "mel": rng.randn(int(d.sum()), 8).astype(np.float32),
                "pitch": rng.randn(10).astype(np.float32),
                "energy": rng.randn(10).astype(np.float32),
                "duration": d,
                "spk_ref_mel_slices":
                    rng.randn(n_slices, 16, 40).astype(np.float32)}

    sups = [[sample(0, 2), sample(1, 1)], [sample(2, 5), sample(3, 3)]]
    qrys = [[sample(4, 1)], [sample(5, 4)]]
    sup, qry, _, _ = collate_episode(sups, qrys, max_seq_len=64)
    ref, valid = sup.speaker_args
    assert ref.shape[:3] == (2, 2, 5)          # E, B, shared S bucket
    assert int(valid[0, 0].sum()) == 2 and int(valid[1, 0].sum()) == 5
    qref, qvalid = qry.speaker_args
    assert qref.shape[2] == 5 and int(qvalid[1, 0].sum()) == 4


def test_packed_device_get_roundtrip():
    """Host snapshot offload fetches pytrees as one transfer per dtype
    group (per-leaf device_get costs ~0.7 s/leaf through the remote-TPU
    tunnel — utils/transfer.py); the packed fetch must be bit-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from metatts_tpu.utils.transfer import packed_device_get

    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {"w": jnp.ones((2, 2, 2), jnp.float32) * 3.5,
              "n": jnp.arange(5, dtype=jnp.int32)},
        "c": jnp.asarray([[1.0, -2.0]], jnp.bfloat16),
        "scalar": jnp.float32(7.25),
        "np_passthrough": np.arange(3),
    }
    host = packed_device_get(tree)
    ref = jax.device_get(tree)
    for h, r in zip(jax.tree.leaves(host), jax.tree.leaves(ref)):
        assert isinstance(h, np.ndarray) or np.isscalar(h)
        assert np.asarray(h).dtype == np.asarray(r).dtype
        assert np.asarray(h).shape == np.asarray(r).shape
        assert np.array_equal(np.asarray(h, np.float32),
                              np.asarray(r, np.float32))
    # single array (non-pytree) and empty tree edge cases
    one = packed_device_get(jnp.arange(4.0))
    assert isinstance(one, np.ndarray) and one[-1] == 3.0
    assert packed_device_get({}) == {}


def test_mel_transfer_dtype_knob():
    """train.transfer_mel_dtype: mels dominate per-step H2D bytes, so the
    wire dtype is configurable (bf16 halves a transfer that outweighs the
    compute step through the remote-TPU tunnel — bench_sustained_fit).
    The loss must stay fp32-exactness-compatible: it upcasts targets."""
    import numpy as np
    import jax.numpy as jnp
    from metatts_tpu.data import collate as C

    rng = np.random.RandomState(0)

    def sample(i):
        d = rng.randint(1, 4, size=(10,)).astype(np.int32)
        return {"id": f"u{i}", "speaker": 0, "raw_text": "x",
                "text": rng.randint(1, 360, size=(10,)).astype(np.int32),
                "mel": rng.randn(int(d.sum()), 8).astype(np.float32),
                "pitch": rng.randn(10).astype(np.float32),
                "energy": rng.randn(10).astype(np.float32),
                "duration": d}

    try:
        # default "auto" on the CPU test backend -> float32 (parity)
        batch, _ = C.collate_batch([sample(0), sample(1)], max_seq_len=64)
        assert batch.mels.dtype == jnp.float32
        C.set_mel_transfer_dtype("bfloat16")
        b16, _ = C.collate_batch([sample(2), sample(3)], max_seq_len=64)
        assert b16.mels.dtype == jnp.bfloat16
        # bf16 wire values match the fp32 ones to bf16 precision
        np.testing.assert_allclose(
            np.asarray(b16.mels, np.float32),
            np.asarray(jnp.asarray(np.asarray(b16.mels, np.float32))),
            rtol=0, atol=0)
        C.set_mel_transfer_dtype("float32")
        b32, _ = C.collate_batch([sample(4)], max_seq_len=64)
        assert b32.mels.dtype == jnp.float32
    finally:
        C.set_mel_transfer_dtype("auto")
