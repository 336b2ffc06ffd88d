from .stft import TacotronSTFT, mel_filterbank  # noqa: F401
from .length_regulator import length_regulate  # noqa: F401
