"""Tiny model registry: name → constructor.

The reference has exactly one model, loaded by file path (src/yolact.rs:18-20).
A registry makes model families first-class: ``get_model("yolact_mnv2_fpn")``.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn: Callable):
        if name in _REGISTRY:
            raise ValueError(f"model {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_model(name: str, *args, **kwargs):
    try:
        ctor = _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}") from None
    return ctor(*args, **kwargs)


def list_models() -> list[str]:
    return sorted(_REGISTRY)
