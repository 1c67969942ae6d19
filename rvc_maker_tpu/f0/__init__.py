from .common import autotune_f0, coarse_f0, shift_f0  # noqa: F401
from .praat_ac import praat_ac  # noqa: F401
from .swipe import swipe  # noqa: F401
from .yin import yin  # noqa: F401
