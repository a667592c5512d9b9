"""First-class profiling helpers.

The reference has no instrumentation beyond a progress bar (SURVEY §5;
reference tools.py:231-267). On TPU, profiling is a first-class concern:
`trace()` captures a full jax.profiler trace viewable in TensorBoard /
Perfetto, and `annotate()` labels pipeline stages so the device timeline
is readable per stage.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the block.

    View with `tensorboard --logdir <log_dir>` (Profile tab) or by loading
    the generated .trace.json.gz into Perfetto.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region so it shows up as a named span in profiler traces.

    Usable as a context manager:  with annotate("reweight"): ...
    """
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """trace(log_dir) if a directory is given, else a no-op."""
    if log_dir is None:
        yield
    else:
        with trace(log_dir):
            yield
