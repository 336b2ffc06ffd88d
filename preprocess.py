"""Offline preprocessing CLI (reference ``preprocess.py``)."""

import argparse
import os

if os.environ.get("METATTS_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["METATTS_PLATFORM"])
from metatts_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

from metatts_tpu import config as C
from metatts_tpu.preprocess import Preprocessor

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, nargs="+",
                        help="preprocess YAML(s)")
    args = parser.parse_args()
    for cfg in C.load_preprocess_configs(args.config):
        outs = Preprocessor(cfg).build_from_path()
        for dset, lines in outs.items():
            print(f"{cfg['dataset']}/{dset}: {len(lines)} utterances")
