"""Experiment logging (reference CometLogger integration, ``main.py:71-82``,
``config/comet.py``).

Primary sink is a local JSONL event stream (hyperparams, scalars, artifact
pointers) — greppable, diffable, no cloud dependency.  When the comet_ml
package is importable and COMET_API_KEY is set, the same events mirror to
Comet with the reference's log flags (code/env logging equivalents).
"""

import json
import os
import time

COMET_CONFIG = {
    "log_code": True,
    "log_graph": True,
    "log_env_details": True,
    "log_env_gpu": False,    # TPU build
    "log_env_cpu": True,
    "log_env_host": True,
}


class ExperimentLogger:
    def __init__(self, log_dir, exp_name="exp", project="meta-tts-tpu"):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "events.jsonl")
        self.exp_name = exp_name
        self._comet = self._maybe_comet(project)

    def _maybe_comet(self, project):
        if not os.environ.get("COMET_API_KEY"):
            return None
        try:
            import comet_ml
        except ImportError:
            return None
        exp = comet_ml.Experiment(project_name=project, **{
            k: v for k, v in COMET_CONFIG.items()
            if k in ("log_code", "log_graph", "log_env_details",
                     "log_env_cpu", "log_env_host")})
        exp.set_name(self.exp_name)
        return exp

    def _emit(self, kind, payload):
        rec = {"t": time.time(), "kind": kind, **payload}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_hyperparams(self, configs):
        self._emit("hyperparams", {"configs": configs})
        if self._comet:
            flat = {}
            def walk(d, prefix=""):
                for k, v in d.items():
                    if isinstance(v, dict):
                        walk(v, f"{prefix}{k}.")
                    else:
                        flat[f"{prefix}{k}"] = v
            for group, cfg in configs.items():
                if isinstance(cfg, dict):
                    walk(cfg, f"{group}.")
            self._comet.log_parameters(flat)

    def log_metrics(self, step, metrics):
        self._emit("metrics", {"step": step, "metrics": {
            k: float(v) for k, v in metrics.items()}})
        if self._comet:
            self._comet.log_metrics(metrics, step=step)

    def log_artifact(self, step, kind, path):
        self._emit("artifact", {"step": step, "artifact_kind": kind,
                                "path": path})
        if self._comet and kind == "audio":
            self._comet.log_audio(path, step=step)
