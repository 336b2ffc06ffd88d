import numpy as np
import pytest

from metatts_tpu.serve import SynthesisEngine
from metatts_tpu.models.fastspeech2 import fastspeech2_init
import jax

from helpers import (tiny_model_cfg, tiny_preprocess_cfg, algorithm_cfg,
                     synth_batch, STATS)


@pytest.fixture(scope="module")
def engine():
    mcfg = tiny_model_cfg()
    pcfg = tiny_preprocess_cfg()
    acfg = algorithm_cfg("meta")
    params, state = fastspeech2_init(jax.random.PRNGKey(0), pcfg, mcfg,
                                     acfg, STATS, 4)
    return SynthesisEngine(params, state, pcfg, mcfg, acfg)


def test_synthesize_text(engine):
    out = engine.synthesize(["hello world", "{HH AH0 L OW1}"],
                            speakers=[0, 1], mel_cap=64)
    assert len(out) == 2
    wav, mel = out[0]
    assert wav.dtype == np.int16
    assert mel.shape[1] == 8
    assert len(wav) == mel.shape[0] * 256


def test_compiled_bucket_reuse(engine):
    engine.synthesize(["hi"], mel_cap=64)
    n = len(engine._compiled)
    engine.synthesize(["ho"], mel_cap=64)   # same bucket -> no new compile
    assert len(engine._compiled) == n


def test_adapt_speaker_changes_output(engine):
    import jax
    import jax.numpy as jnp
    sup = synth_batch(np.random.RandomState(0), B=2)
    adapted = engine.adapt_speaker(sup, steps=3, lr=0.01)
    # adapted modules moved; frozen encoder untouched
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(adapted.params["decoder"]),
        jax.tree.leaves(engine.params["decoder"])))
    assert delta > 0
    enc_delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(adapted.params["encoder"]),
        jax.tree.leaves(engine.params["encoder"])))
    assert enc_delta == 0
    # synthesis still runs on the adapted engine (random init may predict
    # zero durations; only exercise the path)
    out = adapted.synthesize(["hello"], mel_cap=64)
    assert out[0][0].dtype == np.int16
