from .fastspeech2 import (  # noqa: F401
    Batch, FS2Output, fastspeech2_init, fastspeech2_apply, ADAPT_MODULE_KEYS)
from .loss import fastspeech2_loss, LossValues  # noqa: F401
