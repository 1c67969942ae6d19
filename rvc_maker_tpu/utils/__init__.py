from .audio import load_audio, resample, save_wav  # noqa: F401
