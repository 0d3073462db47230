"""Dot-access configuration (replaces the reference's EasyDict + YAML loading).

The reference loads YAML into ``easydict.EasyDict`` (reference train.py:46-47)
and uses ``config.get(key, default)`` for optional keys
(reference models/epsnet/condensenc.py:285-286).  This module provides the
same ergonomics without the easydict dependency, plus round-tripping so
checkpoints can embed their config (reference train.py:221-231 makes
checkpoints self-describing).
"""

from __future__ import annotations

import copy
import io
from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursively applied to nested mappings."""

    def __init__(self, d: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @staticmethod
    def _wrap(value):
        if isinstance(value, Mapping) and not isinstance(value, Config):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        del self[key]

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        """Plain-dict (YAML/pickle friendly) copy."""

        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return {k: unwrap(v) for k, v in self.items()}

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def load_config(path_or_stream) -> Config:
    """Load a YAML config file (compatible with the reference's configs/*.yml)."""
    if isinstance(path_or_stream, io.IOBase):
        raw = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream, "r") as f:
            raw = yaml.safe_load(f)
    return Config(raw)


def save_config(config: Config, path: str) -> None:
    with open(path, "w") as f:
        f.write(config.to_yaml())
