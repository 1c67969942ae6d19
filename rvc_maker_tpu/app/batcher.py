"""Dynamic request batching for conversion serving.

The reference serves one Gradio callback at a time (a subprocess per
click, app.py:839).  On TPU the economics invert: the jitted convert
stages are batched programs, so concurrent requests should ride ONE
device dispatch.  This batcher collects requests for up to
``max_wait_ms`` (or until ``max_batch`` accumulate), pads them into the
pipeline's static length buckets, runs a single ``convert_batch``, and
fans results back out to the waiting callers.

Used by the web server when RVC_TPU_BATCH_SERVE=1; also a library
surface for any custom serving loop.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _valid_out_samples(n_in: int, upp: int) -> int:
    """Output samples actually derived from n_in input samples.

    The HuBERT conv frontend is VALID (eats edges), then frames double
    (x2 nearest interp) and the vocoder upsamples by cfg.upp.  Since the
    batcher pads every request up to a length bucket, samples past this
    limit decode zero-padding, not the request."""
    from ..models.hubert import CONV_LAYERS

    fl = n_in
    for (_, k, s) in CONV_LAYERS:
        fl = (fl - k) // s + 1
    return max(fl, 0) * 2 * upp


class BatcherOverloaded(RuntimeError):
    """Raised to a caller when the request queue is at capacity —
    backpressure instead of unbounded memory growth under sustained
    overload (the reference's subprocess-per-click model simply blocks
    the UI; an in-process server must bound its queue)."""


@dataclass
class _Request:
    audio: np.ndarray                 # (L,) float32 @ 16 kHz
    sid: int
    settings: Any
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None


class ConvertBatcher:
    """Groups concurrent convert requests into device batches.

    Requests are grouped by (settings, sid-independent) key — settings
    select the compiled program; sid rides as a batch input.  Waiting
    callers block on an event; the worker thread loops: drain queue,
    group, pad, convert_batch, distribute.
    """

    def __init__(self, pipeline, *, max_batch: int = 16,
                 max_wait_ms: float = 25.0, max_queue: int = 64):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_queue = max_queue
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue[_Request] = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="convert-batcher")
        self._thread.start()

    # -- client side ------------------------------------------------------

    def convert(self, audio_16k: np.ndarray, sid: int, settings,
                timeout: float = 300.0) -> np.ndarray:
        """Blocking convert; safe from many threads at once."""
        req = _Request(np.asarray(audio_16k, np.float32), int(sid), settings)
        try:
            self._q.put_nowait(req)
        except queue.Full:
            raise BatcherOverloaded(
                f"request queue full ({self.max_queue}); retry later")
        if not req.event.wait(timeout):
            raise TimeoutError("conversion timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # -- worker -----------------------------------------------------------

    def _drain(self) -> list[_Request]:
        """Block for one request, then collect more until max_wait or
        max_batch."""
        import time

        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.time() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            # group by settings (each settings tuple = one compiled
            # program family); typical serving uses one settings object
            groups: dict[Any, list[_Request]] = {}
            for r in batch:
                groups.setdefault(self._settings_key(r.settings), []).append(r)
            for reqs in groups.values():
                self._run_group(reqs)

    @staticmethod
    def _settings_key(settings) -> tuple:
        import dataclasses

        if dataclasses.is_dataclass(settings):
            return tuple(sorted(dataclasses.asdict(settings).items()))
        return (id(settings),)

    def _run_group(self, reqs: list[_Request]):
        try:
            from ..pipelines.convert import _bucket_length

            lengths = np.asarray([len(r.audio) for r in reqs], np.int64)
            # pad to the pipeline's 1 s length BUCKET, not the raw group
            # max: convert_batch compiles one program per (B, L) shape,
            # so arbitrary lengths would recompile per request mix
            L = _bucket_length(int(lengths.max()))
            audio = np.zeros((len(reqs), L), np.float32)
            for i, r in enumerate(reqs):
                audio[i, : len(r.audio)] = r.audio
            sids = [r.sid for r in reqs]
            # sid: convert_batch takes one sid per call in the current
            # API; group further by sid
            by_sid: dict[int, list[int]] = {}
            for i, s in enumerate(sids):
                by_sid.setdefault(s, []).append(i)
            for sid, idxs in by_sid.items():
                sub_audio = audio[idxs]
                sub_lengths = lengths[idxs]
                # pad the BATCH axis up to the next power of two (capped
                # at max_batch) for the same reason as the length bucket:
                # each (B, L) shape is its own compiled program
                b = len(idxs)
                b_pad = 1
                while b_pad < b:
                    b_pad *= 2
                # a non-power-of-two max_batch must stay the hard cap on
                # device batch (memory budget), not get rounded past
                b_pad = min(b_pad, self.max_batch)  # _drain caps b there
                if b_pad > b:
                    sub_audio = np.concatenate(
                        [sub_audio, np.repeat(sub_audio[-1:],
                                              b_pad - b, 0)])
                    sub_lengths = np.concatenate(
                        [sub_lengths, np.repeat(sub_lengths[-1:],
                                                b_pad - b)])
                wav, _ = self.pipeline.convert_batch(
                    sub_audio, sub_lengths, sid, reqs[idxs[0]].settings)
                wav = np.asarray(wav)[:b]
                sr_ratio = self.pipeline.cfg.upp / 160.0  # out per in sample
                for j, i in enumerate(idxs):
                    n_in = len(reqs[i].audio)
                    n_out = min(int(n_in * sr_ratio),
                                _valid_out_samples(n_in,
                                                   self.pipeline.cfg.upp),
                                wav.shape[1])
                    reqs[i].result = wav[j][:n_out]
                    reqs[i].event.set()
            logger.info("batched convert: %d request(s), %d sid group(s)",
                        len(reqs), len(by_sid))
        except Exception as e:  # noqa: BLE001 — report to every waiter
            logger.exception("batched convert failed")
            for r in reqs:
                r.error = e
                r.event.set()
