"""System base: owns params/state/optimizer and compiled step functions.

Functional analogue of the reference's LightningModule ``System``
(``lightning/systems/system.py:26-213``): the object holds configuration and
*host-side* mutable slots (params, opt_state, step counter); all math happens
in jitted pure functions, cached per input-shape bucket.
"""


import jax
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
