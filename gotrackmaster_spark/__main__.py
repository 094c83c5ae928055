"""CLI mirroring the reference's cobra commands
(``/root/reference/cmd/*.go``) so a gotrackmaster user can run the same
commands against this engine::

    python -m gotrackmaster_spark maxspeed --track DIR --maxspeed 200
    python -m gotrackmaster_spark removestops --track DIR --minseconds 90
    python -m gotrackmaster_spark classification --track DIR
    python -m gotrackmaster_spark duplicate --track DIR --startdiff 60 --startDistance 100

Semantics: GPX files are discovered (S2), parsed to the points table,
run through the Spark operator for the command, and — for repair commands
— written back as GPX (S3) unless ``--dry-run`` (root.go:45-67 honors the
same flag).  Defaults match the cobra flag registrations exactly (cited
per subcommand).
"""

from __future__ import annotations

import argparse
import sys


def _session(cpus: str):
    from gotrackmaster_spark.session import get_session

    return get_session("gotrackmaster-cli", master=f"local[{cpus}]")


def _load(spark, track_dir: str):
    from gotrackmaster_spark.sources.gpx import (
        discover_gpx_files,
        gpx_files_to_tables,
    )

    files = discover_gpx_files(track_dir)
    if not files:
        print("no GPX files found", file=sys.stderr)
        sys.exit(1)
    return gpx_files_to_tables(spark, files)


def _write_back(points, tracks, waypoints, out_dir: str, dry_run: bool) -> None:
    if dry_run:
        print(f"[dry-run] would write {tracks.count()} GPX files to {out_dir}")
        return
    from gotrackmaster_spark.sources.gpx import write_gpx_files

    n = write_gpx_files(points, tracks, out_dir, waypoints_df=waypoints)
    print(f"wrote {n} GPX files to {out_dir}")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="gotrackmaster-spark")
    ap.add_argument("--cpus", default="8")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def repair_cmd(name: str, **flags):
        p = sub.add_parser(name)
        p.add_argument("--track", required=True)
        p.add_argument("--out", default=None, help="output dir (default: <track>_fixed)")
        p.add_argument("--dry-run", action="store_true")
        for fname, (ftype, default) in flags.items():
            p.add_argument(f"--{fname}", type=ftype, default=default)
        return p

    # defaults cited from the cobra registrations:
    repair_cmd("maxspeed", maxspeed=(float, 200.0))                       # cmd/maxspeed.go:20
    repair_cmd("smoothgaussianelevation", maxelevation=(float, 1.5))      # cmd/smoothgaussianelevation.go:19
    repair_cmd("smoothgaussiandistance", windowsize=(int, 1), sigma=(float, 1.1))  # cmd/smoothgaussiandistance.go:26-27
    repair_cmd("removenoise", maxdistance=(float, 6.0), maxelevation=(float, 1.1), maxpoints=(int, 4))  # cmd/removenoise.go:21-23
    repair_cmd("removefirstnoise")                                        # cmd/removefirstnoise.go
    repair_cmd("removestops", maxdistance=(float, 5.0), minseconds=(float, 90.0), maxelevation=(float, 0.5), minpoints=(int, 3))  # cmd/removestops.go:26-29
    repair_cmd("simplifypoints", distance=(float, 0.5))                   # cmd/simplifypoints.go
    repair_cmd("removeintersections", maxpoints=(int, 6))                 # cmd/removeintersections.go:19
    repair_cmd("removelastmaxspeed", maxspeed=(float, 14.0))              # cmd/removelastmaxspeed.go:19
    repair_cmd("joinsegments", minpoints=(int, 14))                       # cmd/joinsegments.go:19
    repair_cmd("timestamp")                                               # cmd/timestamp.go
    repair_cmd("elevation")                                               # cmd/elevation.go (synthetic DEM — godem network source replaced)
    repair_cmd("lostelevation")                                           # cmd/lostelevation.go

    for name in ("classification", "quality", "tiles"):
        p = sub.add_parser(name)
        p.add_argument("--track", required=True)

    p = sub.add_parser("duplicate")  # cmd/duplicate.go:49-56
    p.add_argument("--track", required=True)
    p.add_argument("--startdiff", type=int, default=0)
    p.add_argument("--enddiff", type=int, default=0)
    p.add_argument("--startDistance", type=int, default=0)
    p.add_argument("--endDistance", type=int, default=0)
    p.add_argument("--timeComparator", action="store_true")
    p.add_argument("--distanceComparator", action="store_true")
    p.add_argument("--delete", action="store_true",
                   help="Delete duplicate only when equal creator and quality of track")
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser("import")  # cmd/import.go:38-42
    p.add_argument("--track", required=True)
    p.add_argument("--destination", default="")
    p.add_argument("--directoryformat", default="")
    p.add_argument("--archiveformat", default="")
    p.add_argument("--dry-run", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "import":
        # validations precede any Spark work (cmd/import.go:127-138)
        from gotrackmaster_spark.operators.importer import is_valid_format

        if not args.destination:
            print("Destination directory is missing", file=sys.stderr)
            sys.exit(1)
        if args.directoryformat and not is_valid_format(args.directoryformat):
            print("Directory format is wrong", file=sys.stderr)
            sys.exit(1)
        if not is_valid_format(args.archiveformat):
            print("Archive format is wrong", file=sys.stderr)
            sys.exit(1)

    spark = _session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    points, tracks, waypoints = _load(spark, args.track)
    out_dir = getattr(args, "out", None) or (args.track.rstrip("/") + "_fixed")

    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators import repair as R

    if args.cmd == "maxspeed":
        fixed = R.max_speed_fix(points, args.maxspeed)
    elif args.cmd == "smoothgaussianelevation":
        fixed = R.max_speed_vertical_fix(points, args.maxelevation)
    elif args.cmd == "smoothgaussiandistance":
        fixed = R.smooth_gaussian(points, args.windowsize, args.sigma)
    elif args.cmd == "removenoise":
        fixed = R.remove_noise_fix(points, args.maxdistance, args.maxelevation, args.maxpoints)
    elif args.cmd == "removefirstnoise":
        fixed = R.remove_first_noise_fix(points)
    elif args.cmd == "removestops":
        fixed = R.remove_stops_fix(points, args.minseconds, args.maxdistance, args.maxelevation, args.minpoints)
    elif args.cmd == "simplifypoints":
        fixed = R.simplify_fix(points, args.distance)
    elif args.cmd == "removeintersections":
        fixed = R.remove_intersections_fix(points, args.maxpoints)
    elif args.cmd == "removelastmaxspeed":
        fixed = R.remove_last_max_speed_fix(points, args.maxspeed)
    elif args.cmd == "joinsegments":
        fixed = R.move_segments_fix(points, args.minpoints)
    elif args.cmd == "timestamp":
        fixed = R.fix_times(points)
    elif args.cmd == "lostelevation":
        fixed = R.lost_elevation_fix(points)
    elif args.cmd == "elevation":
        from gotrackmaster_spark.driver_queries import synthetic_dem
        from gotrackmaster_spark.operators.spatial import dem_elevation_fix

        fixed = dem_elevation_fix(points, synthetic_dem(spark)).select(*points.columns)
    elif args.cmd in ("classification", "quality"):
        from gotrackmaster_spark.operators.quality import track_profiles

        prof = track_profiles(points)
        cols = (
            ["track_id", "classification"]
            if args.cmd == "classification"
            else ["track_id", "quality", "time_quality", "distance_quality"]
        )
        for r in prof.select(*cols).collect():
            print("\t".join(str(v) for v in r))
        spark.stop()
        return
    elif args.cmd == "tiles":
        from gotrackmaster_spark.functions.tiles import calculate_tiles_col

        b = points.groupBy("track_id").agg(
            F.min("lat").alias("min_lat"), F.max("lat").alias("max_lat"),
            F.min("lon").alias("min_lon"), F.max("lon").alias("max_lon"),
        )
        t = b.select(
            "track_id",
            calculate_tiles_col(F.col("min_lat"), F.col("max_lat"),
                                F.col("min_lon"), F.col("max_lon"), 1.0).alias("tiles1"),
            calculate_tiles_col(F.col("min_lat"), F.col("max_lat"),
                                F.col("min_lon"), F.col("max_lon"), 0.5).alias("tiles05"),
        )
        for r in t.collect():
            print(f"{r.track_id}\t{','.join(r.tiles1)}\t{','.join(r.tiles05)}")
        spark.stop()
        return
    elif args.cmd == "duplicate":
        import os

        from gotrackmaster_spark.operators.quality import (
            duplicate_candidates,
            track_profiles,
        )

        if not (args.startdiff or args.enddiff or args.startDistance or args.endDistance):
            print("You must specify at least one rule", file=sys.stderr)
            spark.stop()
            sys.exit(1)
        # profiles + canonical creator (GetCreator ladder, misc.go:277-362)
        # so delete eligibility (equal creator AND quality, duplicate.go:
        # 66-78) compares what the reference compares
        from gotrackmaster_spark.driver_queries import creator_ladder_col

        prof = track_profiles(points).join(
            tracks.select(
                "track_id", creator_ladder_col(F.col("creator")).alias("creator")
            ),
            "track_id",
            "left",
        )
        pairs = duplicate_candidates(
            prof,
            start_diff=args.startdiff,
            end_diff=args.enddiff,
            start_distance=args.startDistance,
            end_distance=args.endDistance,
            time_comparator=args.timeComparator,
            distance_comparator=args.distanceComparator,
        )
        rows = pairs.collect()
        paths = {r.track_id: r.filename
                 for r in tracks.select("track_id", "filename").collect()}
        n_del = 0
        for r in rows:
            print(f"Duplicate found: {r.a_id} ~ {r.b_id} [{r.status}]")
            if args.delete and r.delete_ok:
                # the reference removes the earlier-seen file (sorted scan
                # order => the canonical smaller id, duplicate.go:69-75)
                n_del += 1
                target = paths.get(r.a_id)
                print(f"Deleting {target}")
                if not args.dry_run and target:
                    os.remove(target)
        print(f"Found {len(rows)} duplicate tracks")
        print(f"Deleted {n_del} duplicate tracks")
        spark.stop()
        return
    elif args.cmd == "import":
        import os
        import shutil

        from gotrackmaster_spark.operators.importer import import_plan
        from gotrackmaster_spark.operators.quality import track_profiles
        from gotrackmaster_spark.schemas import GO_ZERO_NS

        prof = track_profiles(points)
        bounds = points.groupBy("track_id").agg(
            F.min("lat").alias("min_lat"), F.max("lat").alias("max_lat"),
            F.min("lon").alias("min_lon"), F.max("lon").alias("max_lon"),
        )
        # tracks with no start time are skipped (cmd/import.go:158-161);
        # geocode placeholders substitute as empty strings (documented S5
        # substitution — no network geocoder in the engine)
        from gotrackmaster_spark.driver_queries import creator_ladder_col

        summaries = (
            prof.filter(F.col("start_ts_ns") != GO_ZERO_NS)
            .join(bounds, "track_id")
            .join(tracks.select("track_id", "creator", "filename", "file_rank"), "track_id")
            .select(
                "track_id",
                F.timestamp_micros((F.col("start_ts_ns") / 1000).cast("long")).alias("start_ts"),
                # GetCreator canonicalizes the raw creator (misc.go:277-362)
                creator_ladder_col(F.col("creator")).alias("creator"),
                "quality",
                F.regexp_replace(
                    F.element_at(F.split(F.col("filename"), "/"), -1),
                    r"\.[^.]*$", "",
                ).alias("original"),
                F.col("classification").alias("kind"),
                "min_lat", "max_lat", "min_lon", "max_lon",
                "file_rank",
            )
        )
        plan = import_plan(summaries, args.directoryformat, args.archiveformat)
        rows = plan.join(
            tracks.select("track_id", "filename"), "track_id"
        ).collect()
        for r in sorted(rows, key=lambda r: (r.file_rank, r.track_id, r.directory, r.archive)):
            target = f"{args.destination}/{r.directory}/{r.archive}.gpx"
            print(f"[{r.filename}] -> {target}")
            if not args.dry_run:
                os.makedirs(f"{args.destination}/{r.directory}", exist_ok=True)
                shutil.copyfile(r.filename, target)
        spark.stop()
        return
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.cmd}")

    _write_back(fixed, tracks, waypoints, out_dir, args.dry_run)
    spark.stop()


if __name__ == "__main__":
    main()
