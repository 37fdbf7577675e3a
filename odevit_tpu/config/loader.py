"""Hydra-compose-compatible YAML config loader.

The reference uses hydra's compose API over plain YAML with no defaults
lists or overrides (main_classification_ode.py:266-268):

    with initialize(version_base="1.3.2", config_path=path):
        cfg = compose(config_name=name)

hydra/omegaconf are not in this image, so this module provides the same
surface over pyyaml: ``initialize(config_path)`` context manager +
``compose(config_name, overrides=["a.b=c"])`` returning a ``ConfigNode``
with attribute access, dict-style access, ``**unpacking``, and
``.get``/``in``/iteration — everything the entry points and the
reference's YAML key paths need.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Iterator, List, Optional

import yaml

_SEARCH_PATH: List[str] = []


class ConfigNode(dict):
    """dict with attribute access; nested dicts auto-wrap."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(ConfigNode.wrap(v) for v in obj)
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return type(o)(unwrap(v) for v in o)
            return o
        return unwrap(self)

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _parse_value(text: str) -> Any:
    return yaml.safe_load(text)


def _apply_override(cfg: ConfigNode, override: str) -> None:
    key, _, value = override.partition("=")
    parts = key.strip().split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            node[p] = ConfigNode()
        node = node[p]
    node[parts[-1]] = ConfigNode.wrap(_parse_value(value))


@contextlib.contextmanager
def initialize(config_path: str, version_base: Optional[str] = None
               ) -> Iterator[None]:
    """hydra.initialize-compatible: pushes a config search path. Relative
    paths resolve against the caller's CWD (hydra resolves against the
    calling module; for our entry points both coincide)."""
    _SEARCH_PATH.append(os.path.abspath(config_path))
    try:
        yield
    finally:
        _SEARCH_PATH.pop()


def compose(config_name: str,
            overrides: Optional[List[str]] = None) -> ConfigNode:
    if not _SEARCH_PATH:
        raise RuntimeError("compose() called outside initialize()")
    base = _SEARCH_PATH[-1]
    fname = config_name if config_name.endswith((".yaml", ".yml")) \
        else config_name + ".yaml"
    path = os.path.join(base, fname)
    if not os.path.exists(path):
        available = sorted(f for f in os.listdir(base)
                           if f.endswith((".yaml", ".yml")))
        raise FileNotFoundError(
            f"config {config_name!r} not found in {base}; "
            f"available: {available}")
    with open(path) as f:
        cfg = ConfigNode.wrap(yaml.safe_load(f) or {})
    for ov in overrides or []:
        _apply_override(cfg, ov)
    return cfg
