"""File IO helpers (reference toolkit/utils/read_files.py equivalents):
key->columns csv read/write, label-studio style json export reading, and
simple name-list IO used across preprocessing and extraction stages."""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Sequence, Tuple


def write_key_csv(path: str, names: Sequence[str], name2row: Dict[str, list],
                  columns: Sequence[str]) -> None:
    """reference func_write_key_to_csv: one row per name, 'name' first."""
    with open(path, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["name", *columns])
        for n in names:
            writer.writerow([n, *name2row[n]])


def read_key_csv(path: str, column: str) -> Tuple[List[str], Dict[str, str]]:
    """reference func_read_key_from_csv: returns (names, name->value)."""
    names, mapping = [], {}
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            name = row["name"]
            names.append(name)
            mapping[name] = row.get(column, "")
    return names, mapping


def read_labelstudio_export(path: str) -> Dict[str, str]:
    """Label-studio JSON export -> {clip_name: choice} (read_files.py:9-60
    style; tolerant of the two common export shapes)."""
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    out: Dict[str, str] = {}
    for item in data:
        src = item.get("data", {})
        name = os.path.basename(
            src.get("audio") or src.get("video") or src.get("image") or ""
        ).split(".")[0]
        for ann in item.get("annotations", item.get("completions", [])):
            for res in ann.get("result", []):
                choices = res.get("value", {}).get("choices")
                if choices:
                    out[name] = choices[0]
    return out


def read_names(path: str) -> List[str]:
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]
