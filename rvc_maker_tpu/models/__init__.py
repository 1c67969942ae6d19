from . import synthesizer  # noqa: F401
