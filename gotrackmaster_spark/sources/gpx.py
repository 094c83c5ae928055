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
    # top-level waypoints: (lat, lon, ele|None, ts_ns, name|None, link|None)
    waypoints: list[tuple] = field(default_factory=list)

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
    for wpt in root.findall(f"{_NS}wpt"):
        lat = float(wpt.get("lat", "0"))
        lon = float(wpt.get("lon", "0"))
        ele_el = wpt.find(f"{_NS}ele")
        ele = float(ele_el.text) if ele_el is not None and ele_el.text else None
        time_el = wpt.find(f"{_NS}time")
        ts_ns = parse_time_ns(time_el.text if time_el is not None else None)
        name_el = wpt.find(f"{_NS}name")
        name = name_el.text if name_el is not None else None
        link_el = wpt.find(f"{_NS}link")
        link = link_el.get("href") if link_el is not None else None
        parsed.waypoints.append((lat, lon, ele, ts_ns, name, link))
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


def waypoint_rows(parsed: ParsedTrack) -> list[tuple]:
    """Flatten waypoints to WAYPOINTS_SCHEMA rows."""
    rows = []
    for i, (lat, lon, ele, ts_ns, name, link) in enumerate(parsed.waypoints):
        if ts_ns == GO_ZERO_NS:
            ts = None
        else:
            ts = _dt.datetime.fromtimestamp(ts_ns / 1e9, tz=_dt.timezone.utc).replace(tzinfo=None)
        rows.append((parsed.track_id, i, lat, lon, ele, ts, ts_ns, name, link))
    return rows


def gpx_files_to_points_df(spark, paths: list[str]):
    """Parse GPX files into a points DataFrame (POINTS_SCHEMA)."""
    points, tracks, _w = gpx_files_to_tables(spark, paths)
    return points, tracks


def gpx_files_to_tables(spark, paths: list[str]):
    """Full ETL: (points, tracks, waypoints) DataFrames — waypoints ride a
    separate table so repair pipelines over points can't lose them (Wpt[]
    passthrough, reference model tree via go-gpx)."""
    from gotrackmaster_spark.schemas import (
        POINTS_SCHEMA,
        TRACKS_SCHEMA,
        WAYPOINTS_SCHEMA,
    )

    rows: list[tuple] = []
    creators: list[tuple] = []
    wrows: list[tuple] = []
    for rank, p in enumerate(sorted(paths)):
        parsed = parse_gpx_file(p)
        rows.extend(track_to_rows(parsed))
        creators.append((parsed.track_id, parsed.creator, p, rank))
        wrows.extend(waypoint_rows(parsed))
    points = spark.createDataFrame(rows, POINTS_SCHEMA)
    tracks = spark.createDataFrame(creators, TRACKS_SCHEMA)
    waypoints = spark.createDataFrame(wrows, WAYPOINTS_SCHEMA)
    return points, tracks, waypoints


# ------------------------------------------------------------------ sink ---

def _fmt_float(x: float) -> str:
    """Go strconv-style shortest float formatting (xml marshal uses %g-ish
    shortest round-trip representation)."""
    return repr(x) if x != int(x) else str(int(x))


def _fmt_time_ns(ts_ns: int) -> str:
    """epoch ns → RFC3339 with Go's trailing-zero-trimmed fractional part."""
    import datetime as dt

    sec, frac = divmod(ts_ns, 1_000_000_000)
    base = dt.datetime.fromtimestamp(sec, tz=dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )
    if frac:
        f = f"{frac:09d}".rstrip("0")
        base += f".{f}"
    return base + "Z"


def points_to_gpx_xml(rows, creator: str = "gotrackmaster-spark",
                      waypoints=None) -> str:
    """Serialize one track's rows (POINTS_SCHEMA tuples/Rows, any order) to
    indented GPX 1.1 XML — the reference's writeGPX sink
    (/root/reference/cmd/root.go:45-67: xml.Header + two-space indent).
    ``waypoints``: WAYPOINTS_SCHEMA rows re-emitted ahead of the tracks
    (GPX 1.1 element order: wpt then trk).

    The engine-native sink is a new table snapshot (plans.checkpoint);
    this exists so a user of the reference can still export GPX files.
    """
    from xml.sax.saxutils import escape, quoteattr

    from gotrackmaster_spark.schemas import GO_ZERO_NS

    nest: dict[int, dict[int, list]] = {}
    for r in rows:
        nest.setdefault(r.trk_no, {}).setdefault(r.seg_no, []).append(r)
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append(
        f'<gpx version="1.1" creator="{creator}" '
        'xmlns="http://www.topografix.com/GPX/1/1">'
    )
    for w in sorted(waypoints or [], key=lambda w: w.wpt_idx):
        out.append(f'  <wpt lat="{_fmt_float(w.lat)}" lon="{_fmt_float(w.lon)}">')
        if w.ele is not None:
            out.append(f"    <ele>{_fmt_float(w.ele)}</ele>")
        if w.ts_ns is not None and w.ts_ns != GO_ZERO_NS:
            out.append(f"    <time>{_fmt_time_ns(w.ts_ns)}</time>")
        if w.name is not None:
            out.append(f"    <name>{escape(w.name)}</name>")
        if w.link_href is not None:
            out.append(f"    <link href={quoteattr(w.link_href)}/>")
        out.append("  </wpt>")
    for trk_no in sorted(nest):
        out.append("  <trk>")
        for seg_no in sorted(nest[trk_no]):
            out.append("    <trkseg>")
            for p in sorted(nest[trk_no][seg_no], key=lambda r: r.pt_idx):
                out.append(
                    f'      <trkpt lat="{_fmt_float(p.lat)}" lon="{_fmt_float(p.lon)}">'
                )
                out.append(f"        <ele>{_fmt_float(p.ele)}</ele>")
                if p.ts_ns is not None and p.ts_ns != GO_ZERO_NS:
                    out.append(f"        <time>{_fmt_time_ns(p.ts_ns)}</time>")
                out.append("      </trkpt>")
            out.append("    </trkseg>")
        out.append("  </trk>")
    out.append("</gpx>")
    return "\n".join(out)


def write_gpx_files(points_df, tracks_df, out_dir: str, waypoints_df=None) -> int:
    """Distributed GPX export: one file per track via applyInPandas over
    track groups (each file is one group — the reference's per-file loop
    inverted).  ``waypoints_df`` (WAYPOINTS_SCHEMA) re-emits each track's
    top-level waypoints so a parse → repair → write round trip is lossless.
    Returns the number of files written."""
    import os

    import pandas as pd

    creators = {r.track_id: r.creator for r in tracks_df.collect()}
    # waypoints are rare and tiny (handfuls per file) — collect + broadcast
    # by closure keeps the sink a single applyInPandas pass
    wpts: dict[str, list] = {}
    if waypoints_df is not None:
        for r in waypoints_df.collect():
            wpts.setdefault(r.track_id, []).append(r)
    os.makedirs(out_dir, exist_ok=True)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rows = list(pdf.sort_values(["trk_no", "seg_no", "pt_idx"]).itertuples())
        xml_text = points_to_gpx_xml(
            rows, creators.get(key[0], "gotrackmaster-spark"),
            waypoints=wpts.get(key[0]),
        )
        safe = str(key[0]).replace("/", "_")
        path = os.path.join(out_dir, f"{safe}.gpx")
        with open(path, "w") as f:
            f.write(xml_text)
        return pd.DataFrame({"track_id": [key[0]], "path": [path]})

    res = points_df.groupBy("track_id").applyInPandas(fn, "track_id string, path string")
    return res.count()


# --------------------------------------------------------------- discovery ---

def discover_gpx_files(root_dir: str) -> list[str]:
    """S2 — recursive directory walk keeping GPX files, sorted (the
    reference walks with Unsorted=false and keeps mimetype
    application/gpx+xml / text/xml, lib/utils.go:51-92; extension +
    header sniff stands in for the mimetype probe)."""
    import os

    out = []
    for dirpath, _dirs, files in sorted(os.walk(root_dir)):
        for f in sorted(files):
            if not f.lower().endswith(".gpx"):
                continue
            full = os.path.join(dirpath, f)
            try:
                with open(full, "rb") as fh:
                    head = fh.read(256)
            except OSError:
                continue
            if b"<?xml" in head or b"<gpx" in head:
                out.append(full)
    return sorted(out)
