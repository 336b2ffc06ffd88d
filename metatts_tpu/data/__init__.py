from .dataset import TTSDataset, TextDataset  # noqa: F401
from .collate import collate_batch, collate_episode  # noqa: F401
from .episodes import EpisodeSampler  # noqa: F401
from .datamodule import get_datamodule  # noqa: F401
