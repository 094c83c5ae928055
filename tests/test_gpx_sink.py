"""S3 GPX sink: round-trip points -> XML -> points must be lossless."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import FIXTURES  # noqa: E402


def test_gpx_roundtrip_lossless(spark, tmp_path):
    from gotrackmaster_spark.sources.gpx import (
        gpx_files_to_points_df,
        parse_gpx_file,
        track_to_rows,
        write_gpx_files,
    )

    pts, tracks = gpx_files_to_points_df(spark, [FIXTURES["carlos"]])
    n = write_gpx_files(pts, tracks, str(tmp_path))
    assert n == 1

    out_file = str(tmp_path / (FIXTURES["carlos"].rsplit("/", 1)[-1] + ".gpx"))
    orig = track_to_rows(parse_gpx_file(FIXTURES["carlos"]))
    rt = track_to_rows(parse_gpx_file(out_file))
    assert len(orig) == len(rt)
    for a, b in zip(orig, rt):
        # (trk, seg, idx, lat, lon, ele, ts_ns) — exact float64 + ns parity
        assert a[1:7] == b[1:7]
        assert a[8] == b[8]


def test_discover_gpx_files():
    from gotrackmaster_spark.sources.gpx import discover_gpx_files

    found = discover_gpx_files("/root/reference/testdata")
    assert len(found) == 4
    assert all(f.endswith(".gpx") for f in found)
    assert found == sorted(found)
