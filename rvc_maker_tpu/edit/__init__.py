from .ddpm_inversion import (DDIMSchedule, inversion_forward,
                             inversion_reverse, make_schedule,
                             sample_xts_from_x0)

__all__ = ["DDIMSchedule", "make_schedule", "sample_xts_from_x0",
           "inversion_forward", "inversion_reverse"]
