from .torch_import import (  # noqa: F401
    load_synthesizer_pth,
    synthesizer_params_from_state_dict,
)
