"""Registry of known EXTERNAL nerfstudio-compatible methods.

Counterpart of `nerfstudio/configs/external_methods.py:31-105`: methods that
live in other repositories (e.g. UniSim) register a slug + install
instructions here, so `nt-train <slug>` tells the user how to get them instead
of failing with an unknown-method error. Actual external methods plug in via
`neurad_tpu.plugins.registry` entry points once installed.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ExternalMethod:
    """A nerfstudio-compatible method not shipped in this repository."""

    instructions: str  # printed when the user selects the method
    configurations: List[Tuple[str, str]]  # (slug, description)
    pip_package: Optional[str] = None


external_methods: List[ExternalMethod] = [
    ExternalMethod(
        instructions=(
            "UniSim is an external method. Install it first:\n"
            "  pip install git+https://github.com/carlinds/unisim\n"
            "then re-run with the same method slug (the plugin entry point "
            "registers it)."
        ),
        configurations=[
            ("unisim", "UniSim reproduction, as specified in the paper"),
            ("unisim++", "UniSim with some improvements/tweaks"),
        ],
        pip_package="git+https://github.com/carlinds/unisim",
    ),
]


def get_external_methods() -> Dict[str, ExternalMethod]:
    """slug -> ExternalMethod for every registered external configuration."""
    out: Dict[str, ExternalMethod] = {}
    for method in external_methods:
        for slug, _ in method.configurations:
            out[slug] = method
    return out
