"""Hierarchical YAML config with base-file inheritance + CLI overrides.

Semantics follow the reference's config system
(/root/reference/src/limap/util/config.py:22-34 inheritance, :37-94
dotted overrides): a config may name a ``base_config_file``; otherwise a
runner-supplied ``default_path`` is merged under it.  Any nested key can
be overridden from the CLI as ``--a.b.c val`` with type coercion from
the default value; shortcut aliases map short flags to dotted paths.
"""

from __future__ import annotations

import ast
import copy
from typing import Dict, List, Optional

import yaml


def update_recursive(dict1: dict, dictinfo: dict) -> None:
    for k, v in dictinfo.items():
        if isinstance(v, dict):
            if k not in dict1 or not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def update_recursive_deepcopy(dict1: dict, dictinfo: dict) -> dict:
    out = copy.deepcopy(dict1)
    update_recursive(out, dictinfo)
    return out


def load_config(config_file: str,
                default_path: Optional[str] = None) -> dict:
    with open(config_file) as f:
        cfg_loaded = yaml.safe_load(f) or {}
    base_config_file = cfg_loaded.get("base_config_file")
    if base_config_file is not None:
        cfg = load_config(base_config_file)
    elif default_path is not None and config_file != default_path:
        cfg = load_config(default_path)
    else:
        cfg = {}
    update_recursive(cfg, cfg_loaded)
    return cfg


def _coerce(v: str, ref_val):
    """Coerce a CLI string to the type of the existing config value."""
    if isinstance(v, str) and v.lower() in ("none", "null"):
        return None
    if ref_val is None:
        return v
    t = type(ref_val)
    if t is bool:
        return str(v).lower() == "true"
    if t is list:
        parsed = ast.literal_eval(v if v.startswith("[") else f"[{v}]")
        return list(parsed)
    return t(v)


def update_config(cfg: dict, unknown: List[str],
                  shortcuts: Optional[Dict[str, str]] = None) -> dict:
    """Apply ``--a.b.c value`` style overrides (up to any depth)."""
    shortcuts = shortcuts or {}
    args = [shortcuts.get(a, a) for a in unknown]

    i = 0
    while i < len(args):
        arg = args[i]
        if not arg.startswith("--"):
            i += 1
            continue
        keys = arg[2:].split(".")
        node = cfg
        for key in keys[:-1]:
            node = node[key]
        ref_val = node[keys[-1]]

        if isinstance(ref_val, bool):
            # store-true style if no value follows
            if i == len(args) - 1 or args[i + 1].startswith("--"):
                node[keys[-1]] = True
                i += 1
                continue
            node[keys[-1]] = args[i + 1].lower() == "true"
            i += 2
            continue

        v = args[i + 1]
        consumed = 2
        if isinstance(ref_val, list) and not v.startswith("["):
            # multi-token list values
            j = i + 2
            while j < len(args) and not args[j].startswith("--"):
                v += "," + args[j]
                j += 1
            consumed = j - i
        node[keys[-1]] = _coerce(v, ref_val)
        i += consumed
    return cfg
