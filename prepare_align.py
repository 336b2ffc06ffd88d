"""Corpus alignment-prep CLI (reference ``prepare_align.py``)."""

import argparse
import os

if os.environ.get("METATTS_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["METATTS_PLATFORM"])
from metatts_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

from metatts_tpu import config as C
from metatts_tpu.preprocess.prepare_align import prepare_align

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, nargs="+",
                        help="preprocess YAML(s)")
    args = parser.parse_args()
    for cfg in C.load_preprocess_configs(args.config):
        n = prepare_align(cfg)
        print(f"{cfg['dataset']}: wrote {n} utterances to "
              f"{cfg['path']['raw_path']}")
