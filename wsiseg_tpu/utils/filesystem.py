"""Filesystem helpers (capability parity with reference utils/filesystem.py:7-21)."""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np


def make_folder(pth: str, purge: bool = False) -> None:
    """mkdir -p, optionally purging first (reference utils/filesystem.py:7-10)."""
    if purge and os.path.exists(pth):
        shutil.rmtree(pth)
    os.makedirs(pth, exist_ok=True)


def fetch_metadata(pth: str) -> dict:
    """Load a pickled gt.npy metadata store, or {} if absent
    (reference utils/filesystem.py:13-16)."""
    if os.path.exists(pth):
        return np.load(pth, allow_pickle=True).flatten()[0]
    return {}


def fix_path(pth: str, anchor: str | None = None) -> str:
    """Resolve ``pth`` relative to an anchor directory (default: repo root).

    The reference resolved relative to ``utils/`` (utils/filesystem.py:19-21);
    here the anchor is explicit and defaults to the package's parent so the
    behavior is location-independent.
    """
    base = Path(anchor) if anchor is not None else Path(__file__).resolve().parents[2]
    return (base / pth).resolve().as_posix()
