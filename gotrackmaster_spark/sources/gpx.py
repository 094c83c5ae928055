"""GPX 1.1 XML -> columnar rows ETL (reference S1/S2).

The reference parses GPX into a pointer tree per file
(``/root/reference/cmd/root.go:81-96`` via github.com/twpayne/go-gpx); here
ingest is a one-time ETL producing the long points table of
``schemas.POINTS_SCHEMA`` plus a small tracks dimension.  Pure stdlib
(xml.etree) — runs on the driver for the 4 test fixtures, or inside
``spark.read.format('binaryFile')`` + mapInPandas for bulk ingest.

Timestamps are parsed to exact epoch nanoseconds (GPX fractional seconds
like ``.5`` must survive; Spark timestamps are µs so ``ts_ns`` rides along).
Missing <time> becomes Go's zero time sentinel (GO_ZERO_NS).
"""

from __future__ import annotations

import datetime as _dt
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from gotrackmaster_spark.schemas import GO_ZERO_NS

_NS = "{http://www.topografix.com/GPX/1/1}"


@dataclass
class ParsedTrack:
    track_id: str
    creator: str
    # segments[trk_no][seg_no] = list of (lat, lon, ele, ts_ns)
    tracks: list[list[list[tuple[float, float, float, int]]]] = field(default_factory=list)

    def n_points(self) -> int:
        return sum(len(s) for t in self.tracks for s in t)


def parse_time_ns(text: str | None) -> int:
    """ISO-8601 GPX time -> epoch ns (exact fractional seconds)."""
    if not text:
        return GO_ZERO_NS
    text = text.strip()
    if text.endswith("Z"):
        text = text[:-1]
        offset = 0
    elif "+" in text[10:]:
        base, _, off = text.partition("+")
        h, _, m = off.partition(":")
        offset = -(int(h) * 3600 + int(m or 0) * 60)
        text = base
    else:
        offset = 0
    frac_ns = 0
    if "." in text:
        text, _, frac = text.partition(".")
        frac_ns = int(frac.ljust(9, "0")[:9])
    dt = _dt.datetime.strptime(text, "%Y-%m-%dT%H:%M:%S").replace(tzinfo=_dt.timezone.utc)
    return (int(dt.timestamp()) + offset) * 1_000_000_000 + frac_ns


def parse_gpx_file(path: str, track_id: str | None = None) -> ParsedTrack:
    root = ET.parse(path).getroot()
    creator = root.get("creator", "")
    tid = track_id or path.rsplit("/", 1)[-1]
    parsed = ParsedTrack(track_id=tid, creator=creator)
    for trk in root.findall(f"{_NS}trk"):
        segs = []
        for seg in trk.findall(f"{_NS}trkseg"):
            pts = []
            for pt in seg.findall(f"{_NS}trkpt"):
                lat = float(pt.get("lat", "0"))
                lon = float(pt.get("lon", "0"))
                ele_el = pt.find(f"{_NS}ele")
                ele = float(ele_el.text) if ele_el is not None and ele_el.text else 0.0
                time_el = pt.find(f"{_NS}time")
                ts_ns = parse_time_ns(time_el.text if time_el is not None else None)
                pts.append((lat, lon, ele, ts_ns))
            segs.append(pts)
        parsed.tracks.append(segs)
    return parsed


def track_to_rows(parsed: ParsedTrack) -> list[tuple]:
    """Flatten to POINTS_SCHEMA rows: (track_id, trk_no, seg_no, pt_idx,
    lat, lon, ele, ts, ts_ns)."""
    rows = []
    for trk_no, segs in enumerate(parsed.tracks):
        for seg_no, pts in enumerate(segs):
            for pt_idx, (lat, lon, ele, ts_ns) in enumerate(pts):
                if ts_ns == GO_ZERO_NS:
                    ts = None
                else:
                    ts = _dt.datetime.fromtimestamp(ts_ns / 1e9, tz=_dt.timezone.utc).replace(tzinfo=None)
                rows.append(
                    (parsed.track_id, trk_no, seg_no, pt_idx, lat, lon, ele, ts, ts_ns)
                )
    return rows


def gpx_files_to_points_df(spark, paths: list[str]):
    """Parse GPX files into a points DataFrame (POINTS_SCHEMA)."""
    from gotrackmaster_spark.schemas import POINTS_SCHEMA

    rows: list[tuple] = []
    creators: list[tuple] = []
    for rank, p in enumerate(sorted(paths)):
        parsed = parse_gpx_file(p)
        rows.extend(track_to_rows(parsed))
        creators.append((parsed.track_id, parsed.creator, p, rank))
    points = spark.createDataFrame(rows, POINTS_SCHEMA)
    from gotrackmaster_spark.schemas import TRACKS_SCHEMA

    tracks = spark.createDataFrame(creators, TRACKS_SCHEMA)
    return points, tracks
