"""Name -> class registries.

The reference dispatches classes with raw ``exec`` on config strings
(reference: src/utils/net_config.py:9-20, src/common.py:10-14,
src/trainers/lsps_trainer.py:21-24).  We replace that with explicit
registries so configs stay data, not code.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRIES: Dict[str, Dict[str, object]] = {}


def register(kind: str, name: str | None = None) -> Callable:
    """Decorator: register a class/function under ``kind`` with ``name``."""

    def deco(obj):
        key = name or obj.__name__
        _REGISTRIES.setdefault(kind, {})[key] = obj
        return obj

    return deco


def lookup(kind: str, name: str):
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        known = sorted(_REGISTRIES.get(kind, {}))
        raise KeyError(
            f"No {kind!r} registered under {name!r}. Known: {known}"
        ) from None


def registered(kind: str) -> Dict[str, object]:
    return dict(_REGISTRIES.get(kind, {}))
