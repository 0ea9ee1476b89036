"""Split-file resolution.

The reference ships ``splits/<name>/{train,val,test,test_mask}_files.txt``
(~141k lines of dataset metadata, SURVEY §2.3). We resolve splits from, in
order: ``<repo>/splits``, ``$DYNAMO_SPLITS_DIR``, then a reference checkout
mounted at ``/root/reference/splits`` (read-only). ``scripts/fetch_splits.py``
copies them into the repo from any Dynamo-Depth checkout.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))

_CANDIDATES = [
    osp.join(_REPO_ROOT, "splits"),
    os.environ.get("DYNAMO_SPLITS_DIR", ""),
    "/root/reference/splits",
]


def splits_dir() -> str:
    for c in _CANDIDATES:
        if c and osp.isdir(c):
            return c
    raise FileNotFoundError(
        "No splits directory found. Run scripts/fetch_splits.py <dynamo-depth-checkout> "
        "or set DYNAMO_SPLITS_DIR."
    )


def read_split(split: str, which: str = "train") -> List[str]:
    """Read ``splits/<split>/<which>_files.txt`` -> list of '<seg> <frame> [side]'."""
    path = osp.join(splits_dir(), split, f"{which}_files.txt")
    with open(path) as f:
        return f.read().splitlines()


def split_exists(split: str, which: str) -> bool:
    try:
        return osp.exists(osp.join(splits_dir(), split, f"{which}_files.txt"))
    except FileNotFoundError:
        return False
