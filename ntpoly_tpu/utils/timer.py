"""Named wall-clock timers (reference Source/Fortran/TimerModule.F90:16-117).

The reference reduces max times over MPI ranks for the distributed report;
in single-controller JAX every timer is already global, so
print_all_timers_distributed is an alias.  ``block_until_ready`` friends are
the caller's responsibility — these measure host wall time.
"""
from __future__ import annotations

import time

from .logging import logger, sub_log

_starts: dict[str, float] = {}
_totals: dict[str, float] = {}


def register_timer(name: str):
    _totals.setdefault(name, 0.0)


def start_timer(name: str):
    register_timer(name)
    _starts[name] = time.perf_counter()


def stop_timer(name: str):
    t0 = _starts.pop(name, None)
    if t0 is not None:
        _totals[name] = _totals.get(name, 0.0) + time.perf_counter() - t0


def get_timer(name: str) -> float:
    return _totals.get(name, 0.0)


def reset_timers():
    _starts.clear()
    _totals.clear()


def print_all_timers():
    with sub_log("Timers"):
        for name, total in _totals.items():
            logger.write_element(name, total)


print_all_timers_distributed = print_all_timers
