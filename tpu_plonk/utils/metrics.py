"""Structured per-round metrics (SURVEY.md §5.5): the prover emits one
JSON-able record per proof with per-round wall-clock and sizes; this is
also the substrate of the bench harness."""

import json
import time
import contextlib


class Metrics:
    def __init__(self):
        self.records = {}
        self.counters = {}

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name] = self.records.get(name, 0.0) + \
                (time.perf_counter() - t0)

    def count(self, name: str, value: int = 1):
        self.counters[name] = self.counters.get(name, 0) + value

    def to_dict(self) -> dict:
        out = {f"{k}_s": round(v, 6) for k, v in self.records.items()}
        out.update(self.counters)
        return out

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)


class NullMetrics(Metrics):
    @contextlib.contextmanager
    def timed(self, name: str):
        yield

    def count(self, name: str, value: int = 1):
        pass
