"""Metrics writers.

tensorboardX is the primary channel (as in the reference,
evaluation.py:325-333); NullWriter degrades gracefully when it is absent, and
JsonlWriter provides a dependency-free machine-readable metrics stream for
benchmark tooling.
"""
from __future__ import annotations

import json
from pathlib import Path


class NullWriter:
    def add_scalar(self, *args, **kwargs):
        pass

    def add_histogram(self, *args, **kwargs):
        pass

    def add_image(self, *args, **kwargs):
        pass

    def add_figure(self, *args, **kwargs):
        pass

    def close(self):
        pass


class JsonlWriter:
    """One JSON object per scalar, appended to metrics.jsonl."""

    def __init__(self, directory):
        self.path = Path(directory) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = self.path.open("a")

    def add_scalar(self, tag, value, step=None):
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")

    def add_histogram(self, tag, values, step=None):
        pass

    def add_image(self, *args, **kwargs):
        pass

    def add_figure(self, *args, **kwargs):
        pass

    def close(self):
        self._f.close()
