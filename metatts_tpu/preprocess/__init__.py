from .textgrid import read_textgrid, IntervalTier  # noqa: F401

from .preprocessor import Preprocessor  # noqa: F401
