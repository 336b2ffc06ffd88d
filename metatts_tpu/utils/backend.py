"""Backend identification.

``jax.default_backend()`` returns the PLATFORM name.  For the tunneled TPU
plugin that name is "axon", not "tpu", so any gate testing ``== "tpu"``
silently misroutes real-TPU runs onto the CPU-fallback path (this bit
``resolve_layer_scan`` once already — see models/transformer.py).  All
TPU-or-not decisions go through :func:`is_tpu` instead: a backend counts as
TPU when its platform is a known TPU plugin name or its device kind says so
(v5e reports device_kind like "TPU v5 lite").
"""

import jax

# platform names that ARE TPUs: the native PJRT plugin ("tpu") and the
# tunneled remote plugin used in this environment ("axon")
_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu() -> bool:
    """True when the default JAX backend executes on a TPU."""
    if jax.default_backend() in _TPU_PLATFORMS:
        return True
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    kind = (getattr(d, "device_kind", "") or "").lower()
    return "tpu" in kind or getattr(d, "platform", None) in _TPU_PLATFORMS


def is_cpu() -> bool:
    """True when the default backend is the XLA:CPU host backend."""
    return jax.default_backend() == "cpu"
