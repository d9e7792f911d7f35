"""Logging, timers and per-stage statistics.

Equivalent of the reference's Debug levels + Timer + prefilter statistics
(lib/mmseqs/src/commons/Debug.h:42-208, Timer.h:8,
prefiltering/Prefiltering.cpp:953-975): leveled stderr logging, wall-clock
stage timing, and a counters registry every stage reports into.
"""

import sys
import time

LEVEL_NOTHING = 0
LEVEL_ERROR = 1
LEVEL_WARNING = 2
LEVEL_INFO = 3
LEVEL_DEBUG = 4

_level = LEVEL_INFO


def set_level(level):
    global _level
    _level = level


def _emit(tag, msg):
    print(f"[{tag}] {msg}", file=sys.stderr, flush=True)


def error(msg):
    if _level >= LEVEL_ERROR:
        _emit("ERROR", msg)


def warning(msg):
    if _level >= LEVEL_WARNING:
        _emit("WARN", msg)


def info(msg):
    if _level >= LEVEL_INFO:
        _emit("INFO", msg)


def debug(msg):
    if _level >= LEVEL_DEBUG:
        _emit("DEBUG", msg)


class StageTimer:
    """Wall-clock per-stage timing with a summary table."""

    def __init__(self):
        self.stages = []

    def stage(self, name):
        return _StageCtx(self, name)

    def report(self):
        total = sum(dt for _, dt in self.stages)
        for name, dt in self.stages:
            info(f"{name:<28s} {dt:8.3f}s {100*dt/max(total,1e-9):5.1f}%")
        info(f"{'total':<28s} {total:8.3f}s")
        return dict(self.stages)


class _StageCtx:
    def __init__(self, timer, name):
        self.timer = timer
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        debug(f"stage {self.name} start")
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        self.timer.stages.append((self.name, dt))
        info(f"stage {self.name}: {dt:.3f}s")
        return False


class Stats:
    """Per-run counters (the reference prints k-mers/pos, matches/query
    etc. after the prefilter; we track the analogous numbers)."""

    def __init__(self):
        self.counters = {}

    def add(self, name, value=1):
        self.counters[name] = self.counters.get(name, 0) + value

    def set(self, name, value):
        self.counters[name] = value

    def report(self):
        for name in sorted(self.counters):
            info(f"{name}: {self.counters[name]}")
        return dict(self.counters)
