"""Entry-point plugin discovery for methods and dataparsers.

TPU-native counterpart of `nerfstudio/plugins/registry.py:34` +
`registry_dataparser.py`: external packages register factories via the
`neurad_tpu.method_configs` / `neurad_tpu.dataparser_configs` entry-point groups,
or via the NEURAD_TPU_METHOD_CONFIGS env var ("module:function" specs).
"""

from __future__ import annotations

import importlib
import os
from typing import Callable, Dict

METHOD_ENTRYPOINT_GROUP = "neurad_tpu.method_configs"
DATAPARSER_ENTRYPOINT_GROUP = "neurad_tpu.dataparser_configs"
METHOD_ENV_VAR = "NEURAD_TPU_METHOD_CONFIGS"


def _load_env_specs(env_var: str) -> Dict[str, Callable]:
    """Parse 'name=module:function' comma-separated specs from an env var."""
    out: Dict[str, Callable] = {}
    raw = os.environ.get(env_var, "")
    for item in filter(None, (s.strip() for s in raw.split(","))):
        name, _, target = item.partition("=")
        module, _, attr = target.partition(":")
        try:
            out[name] = getattr(importlib.import_module(module), attr)
        except Exception as e:  # plugin failures must not break startup (`registry.py:60`)
            print(f"[plugins] failed to load {item!r}: {e}")
    return out


def _load_entry_points(group: str) -> Dict[str, Callable]:
    out: Dict[str, Callable] = {}
    try:
        from importlib.metadata import entry_points

        for ep in entry_points(group=group):
            try:
                out[ep.name] = ep.load()
            except Exception as e:
                print(f"[plugins] failed to load entry point {ep.name!r}: {e}")
    except Exception:
        pass
    return out


def discover_methods() -> Dict[str, Callable]:
    """All externally-registered method factories (`registry.py:34-70`)."""
    methods = _load_entry_points(METHOD_ENTRYPOINT_GROUP)
    methods.update(_load_env_specs(METHOD_ENV_VAR))
    return methods


def discover_dataparsers() -> Dict[str, Callable]:
    return _load_entry_points(DATAPARSER_ENTRYPOINT_GROUP)


def register_discovered_methods() -> None:
    """Merge plugin methods into the main registry (called by the CLI)."""
    from neurad_tpu.configs.method_configs import register_method

    for name, factory in discover_methods().items():
        register_method(name, factory)
