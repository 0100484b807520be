from . import sampling, stft

__all__ = ["sampling", "stft"]
