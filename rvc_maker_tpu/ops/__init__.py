from . import nn, stft  # noqa: F401
