from .tools import (  # noqa: F401
    get_mask_from_lengths,
    pad_1d,
    pad_2d,
    bucket_length,
)
