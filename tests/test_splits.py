"""Vendored split files (reference splits/*; SURVEY §2.3 line counts).

The repo must be self-contained: split resolution must work with the
repo-local ``splits/`` directory alone, without the ``/root/reference``
mount fallback (VERDICT round 1, missing item 3).
"""

import os.path as osp

from dynamo_depth_tpu.data import splits as S


def test_vendored_splits_resolve_repo_local(monkeypatch):
    # Without an override, the repo-local directory must win (not the mount).
    monkeypatch.delenv("DYNAMO_SPLITS_DIR", raising=False)
    d = S.splits_dir()
    assert d == osp.join(S._REPO_ROOT, "splits"), d


def test_override_dir_falls_through_per_file(tmp_path, monkeypatch):
    # A DYNAMO_SPLITS_DIR that defines only one split wins for that split but
    # falls through to the vendored files for everything else.
    (tmp_path / "tiny").mkdir()
    (tmp_path / "tiny" / "train_files.txt").write_text("seg 1 l\n")
    monkeypatch.setenv("DYNAMO_SPLITS_DIR", str(tmp_path))
    assert S.read_split("tiny", "train") == ["seg 1 l"]
    assert len(S.read_split("eigen_zhou", "train")) == 39810


def test_split_line_counts_match_reference_inventory():
    # Counts from SURVEY §2.3 / reference splits/*.txt.
    expected = {
        ("eigen_zhou", "train"): 39810,
        ("eigen_zhou", "test"): 697,
        ("nuscenes", "train"): 79760,
        ("nuscenes", "test"): 6019,
        ("nuscenes", "test_mask"): 6019,
        ("nuscenes_dayclear", "test"): 4449,
        ("nuscenes_dayclear", "test_mask"): 4449,
        ("waymo", "test"): 2216,
        ("waymo", "test_mask"): 1881,
    }
    for (split, which), n in expected.items():
        lines = S.read_split(split, which)
        assert len(lines) == n, (split, which, len(lines))


def test_split_line_format():
    lines = S.read_split("eigen_zhou", "train")
    seg, frame, side = lines[0].split()
    assert frame.isdigit() and side in ("l", "r")
    # waymo/nuscenes lines are '<segment> <frame>'
    seg, frame = S.read_split("waymo", "test")[0].split()
    assert frame.lstrip("-").isdigit()


def test_split_exists_helper():
    assert S.split_exists("eigen_zhou", "train")
    assert not S.split_exists("waymo", "train")  # reference ships none either
