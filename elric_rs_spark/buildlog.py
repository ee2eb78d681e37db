"""Session-memo build attribution log (VERDICT r11 #7).

Every session-scoped memoized build (KMV sketch, CC labels, portable
pairs, kernel grams, co-purchase edges, IVF celldots, winnow selection)
records its name and wall seconds here when it actually BUILDS (cache
misses only). bench.py snapshots the log length around each timed query
and emits a `builds` section in the payload, so a memo consumer's bench
row is interpretable from the JSON alone: the first consumer in suite
order pays the build inside its own timed region, and the payload now
says which query paid for which build and how much of its row is
amortizable shared work.
"""

from __future__ import annotations

import time

BUILDS: list[dict] = []


def record(name: str, sec: float) -> None:
    BUILDS.append({"name": name, "sec": round(sec, 3)})


class timed:
    """Context manager: logs the enclosed build's wall time."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            record(self.name, time.perf_counter() - self.t0)
        return False
