"""Copy split files from a Dynamo-Depth checkout into this repo.

Usage: python scripts/fetch_splits.py /path/to/Dynamo-Depth
"""

import os
import os.path as osp
import shutil
import sys

if __name__ == "__main__":
    src = osp.join(sys.argv[1], "splits")
    dst = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "splits")
    assert osp.isdir(src), f"no splits dir at {src}"
    os.makedirs(dst, exist_ok=True)
    for split in os.listdir(src):
        sdir = osp.join(src, split)
        if not osp.isdir(sdir):
            continue
        os.makedirs(osp.join(dst, split), exist_ok=True)
        for f in os.listdir(sdir):
            if f.endswith(".txt"):
                shutil.copyfile(osp.join(sdir, f), osp.join(dst, split, f))
                print(f"copied {split}/{f}")
