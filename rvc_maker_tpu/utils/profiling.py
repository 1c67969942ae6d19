"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference only has wall-clock deltas around stages; here the same
log format plus first-class XLA tracing:

- stage_timer(name): context manager that fences device work
  (block_until_ready on the value passed to .result()) and logs ms.
- jax_trace(logdir): wraps jax.profiler.trace — view in TensorBoard's
  profile plugin or Perfetto.
- RVC_TPU_PROFILE=1 turns on per-stage fenced timing inside
  ConvertPipeline.convert_batch (off by default: the staged jits
  deliberately dispatch async, and fencing serializes them).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger(__name__)

PROFILE_ENV = "RVC_TPU_PROFILE"


def profiling_enabled() -> bool:
    return os.environ.get(PROFILE_ENV, "") not in ("", "0", "false")


class stage_timer:
    """with stage_timer("rmvpe") as t: out = ...; t.result(out)"""

    def __init__(self, name: str):
        self.name = name
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def result(self, value):
        import jax

        jax.block_until_ready(value)
        return value

    def __exit__(self, *exc):
        logger.info("stage %s: %.1f ms", self.name,
                    (time.time() - self._t0) * 1000.0)
        return False


@contextlib.contextmanager
def jax_trace(logdir: str):
    """XLA device trace into logdir (TensorBoard profile / Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", logdir)
