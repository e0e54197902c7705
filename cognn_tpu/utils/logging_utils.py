"""Per-party logging with the reference's grep-able span format.

The reference's only profiler is wall-clock spans printed as
``::<tag> took <seconds>`` lines, which the plot suite greps
(SURVEY.md §5 "Tracing/profiling"; reference `tools/plot/
plot_duration_breakdown_and_comm.py:23-47`). We keep that exact line format so
the rebuilt plot tools (and the reference's own) parse our logs, and add an
optional structured JSONL sink.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Iterator, Optional, TextIO

_JSONL_SINK: Optional[TextIO] = None


def set_jsonl_sink(fp: Optional[TextIO]) -> None:
    global _JSONL_SINK
    _JSONL_SINK = fp


def log(msg: str) -> None:
    print(msg, flush=True)


@contextlib.contextmanager
def duration_span(tag: str, *, out: TextIO = sys.stdout) -> Iterator[None]:
    """Time a phase and print ``::<tag> took <secs>`` (reference format)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        print(f"::{tag} took {dt:.6f}", file=out, flush=True)
        if _JSONL_SINK is not None:
            _JSONL_SINK.write(json.dumps({"span": tag, "seconds": dt}) + "\n")
            _JSONL_SINK.flush()
