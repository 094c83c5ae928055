"""CLI parity surface: the reference's commands drive the engine
end-to-end (discover → repair → GPX write-back)."""

from __future__ import annotations

import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES  # noqa: E402


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "gotrackmaster_spark", "--cpus", "4", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )


def test_cli_maxspeed_fix_golden(tmp_path):
    src = tmp_path / "tracks"
    src.mkdir()
    shutil.copy(FIXTURES["pedraforca"], src)
    out = tmp_path / "out"
    r = _run(["maxspeed", "--track", str(src), "--maxspeed", "300", "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote 1 GPX files" in r.stdout

    from gotrackmaster_spark.sources.gpx import parse_gpx_file

    g = parse_gpx_file(str(out / (FIXTURES["pedraforca"].rsplit("/", 1)[-1] + ".gpx")))
    # golden values from trackmaster/speed_test.go:24-31
    lat, lon, _ele, _t = g.tracks[0][0][504]
    assert (lat, lon) == (42.24870745000008, 1.664240950000083)
    lat, lon, _ele, _t = g.tracks[1][0][7]
    assert (lat, lon) == (42.24071075000116, 1.7195158000128756)


def test_cli_classification_and_dry_run(tmp_path):
    src = tmp_path / "tracks"
    src.mkdir()
    shutil.copy(FIXTURES["carlos"], src)
    r = _run(["classification", "--track", str(src)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "carlos" in r.stdout and "\t" in r.stdout

    r2 = _run(["timestamp", "--track", str(src), "--dry-run"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "[dry-run]" in r2.stdout
    assert not (tmp_path / "tracks_fixed").exists()


def test_cli_simplify_and_joinsegments(tmp_path):
    src = tmp_path / "tracks"
    src.mkdir()
    shutil.copy(FIXTURES["sun"], src)  # 5 segments → joinsegments does work
    out1 = tmp_path / "o1"
    r = _run(["simplifypoints", "--track", str(src), "--distance", "0.5", "--out", str(out1)])
    assert r.returncode == 0, r.stderr[-2000:]
    out2 = tmp_path / "o2"
    r = _run(["joinsegments", "--track", str(src), "--minpoints", "14", "--out", str(out2)])
    assert r.returncode == 0, r.stderr[-2000:]

    from gotrackmaster_spark.sources.gpx import parse_gpx_file

    name = FIXTURES["sun"].rsplit("/", 1)[-1] + ".gpx"
    orig = parse_gpx_file(FIXTURES["sun"])
    simp = parse_gpx_file(str(out1 / name))
    joined = parse_gpx_file(str(out2 / name))
    # sun has no sub-0.5 m point pairs → simplify may be a no-op; the
    # command path (parse → kernel → GPX write) is what's under test
    assert 0 < simp.n_points() <= orig.n_points()
    assert 0 < len(joined.tracks[0]) <= len(orig.tracks[0])


def test_cli_duplicate_full_flags_and_delete(tmp_path):
    """duplicate with end bands + comparators + --delete: the copied
    fixture pairs with itself ("start and end time"), is delete-eligible
    (same creator + quality), and --delete removes the earlier-seen file
    (the canonical smaller id) — --dry-run keeps it."""
    import xml.etree.ElementTree as ET

    src = tmp_path / "tracks"
    src.mkdir()
    shutil.copy(FIXTURES["carlos"], src)
    base = FIXTURES["carlos"].rsplit("/", 1)[-1]
    copy_name = "a_" + base  # sorts FIRST -> it is the deletion target
    shutil.copy(FIXTURES["carlos"], src / copy_name)

    args = ["duplicate", "--track", str(src), "--startdiff", "60",
            "--enddiff", "60", "--startDistance", "100",
            "--endDistance", "100", "--timeComparator",
            "--distanceComparator", "--delete"]
    r = _run([*args, "--dry-run"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[start and end time]" in r.stdout
    assert "Found 1 duplicate tracks" in r.stdout
    assert "Deleted 1 duplicate tracks" in r.stdout
    assert (src / copy_name).exists()  # dry run never removes

    r2 = _run(args)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Deleted 1 duplicate tracks" in r2.stdout
    assert not (src / copy_name).exists()
    assert (src / base).exists()

    # no rules -> reference exits with an error (duplicate.go:103-106)
    r3 = _run(["duplicate", "--track", str(src)])
    assert r3.returncode != 0
    assert "at least one rule" in r3.stderr


def test_cli_import_organizes_tracks(tmp_path):
    """import: templated directory/archive fan-out, file copies into the
    destination tree, validation errors for bad/missing formats."""
    src = tmp_path / "tracks"
    src.mkdir()
    shutil.copy(FIXTURES["carlos"], src)
    shutil.copy(FIXTURES["pedraforca"], src)
    dest = tmp_path / "organized"

    r = _run(["import", "--track", str(src), "--destination", str(dest),
              "--directoryformat", "{year}/{month}",
              "--archiveformat", "{original}_{creator}_q{quality}_{degree1}"])
    assert r.returncode == 0, r.stderr[-2000:]
    copied = sorted(p.relative_to(dest).as_posix() for p in dest.rglob("*.gpx"))
    assert copied, r.stdout
    # every target is year/month/original_creator_qNN_tile.gpx
    import re

    for c in copied:
        assert re.fullmatch(r"\d{4}/\d{2}/.+_q\d+_[NS]\d{2}[EW]\d{3}\.gpx", c), c
    # the fan-out copies each track into every degree1 corner tile dir
    assert len(copied) >= 2

    # validation parity (cmd/import.go:127-138)
    r2 = _run(["import", "--track", str(src), "--directoryformat", "{year}",
               "--archiveformat", "{original}"])
    assert r2.returncode != 0 and "Destination directory is missing" in r2.stderr
    r3 = _run(["import", "--track", str(src), "--destination", str(dest),
               "--archiveformat", "no_placeholders"])
    assert r3.returncode != 0 and "Archive format is wrong" in r3.stderr
    r4 = _run(["import", "--track", str(src), "--destination", str(dest),
               "--directoryformat", "{year}:bad", "--archiveformat", "{original}"])
    assert r4.returncode != 0 and "Directory format is wrong" in r4.stderr
