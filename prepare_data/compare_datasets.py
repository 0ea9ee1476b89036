"""Byte-compare a processed dataset directory against golden fixtures
(reference ``prepare_data/compare_datasets.py``).

Usage: python prepare_data/compare_datasets.py <dir1> <dir2>
e.g. compare your first processed segment against assets/tiny_* fixtures.
"""

import filecmp
import os
import os.path as osp
import sys


def get_all_files(directory):
    out = []
    for dirpath, _, filenames in os.walk(directory):
        for filename in filenames:
            out.append(osp.join(dirpath[len(directory):], filename))
    return out


def compare_directories(dir1, dir2):
    f1s = get_all_files(dir1)
    f2s = get_all_files(dir2)
    common = set(f1s) & set(f2s)

    print(f"# of files in {dir1}: {len(f1s)}")
    print(f"# of files in {dir2}: {len(f2s)}")
    print(f"# of common files: {len(common)}")

    all_good = True
    for f in sorted(common):
        p1, p2 = osp.join(dir1, f), osp.join(dir2, f)
        if not osp.exists(p1) or not osp.exists(p2):
            print(f"### Error! {f} missing on one side!")
            all_good = False
            continue
        if not filecmp.cmp(p1, p2):
            print(f"### Error! {f} is different in two directories!")
            all_good = False
    if all_good:
        print("All common files matched!")
    return all_good


if __name__ == "__main__":
    compare_directories(sys.argv[1], sys.argv[2])
