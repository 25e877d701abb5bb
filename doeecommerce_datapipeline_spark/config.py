"""YAML config surface with ${ENV_VAR} substitution (SURVEY.md §2.11
C7 — reference scripts/run_pipeline.py:107-116, config/*.yml).

Same contract: any string value may embed ${VAR}; unset vars resolve
to empty string, mirroring the reference's permissive substitution.
"""

from __future__ import annotations

import os
import re

import yaml

_VAR = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _substitute(value):
    if isinstance(value, str):
        return _VAR.sub(lambda m: os.environ.get(m.group(1), ""), value)
    if isinstance(value, dict):
        return {k: _substitute(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute(v) for v in value]
    return value


def load_config(path: str) -> dict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _substitute(raw)
