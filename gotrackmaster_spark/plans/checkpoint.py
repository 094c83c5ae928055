"""E6 — Iceberg-style snapshot log over Parquet: checkpointing, resume,
per-partition lineage + metrics.

No Iceberg jar ships in the sandbox, so snapshot semantics are provided by
a JSON manifest log behind a narrow ``Catalog`` interface (SURVEY.md §7.5):

    root/
      <table>/
        snap-00000001/part=.../*.parquet      (immutable data files)
        _log/00000001.json                    (manifest: files, lineage,
                                               per-partition metrics,
                                               parent snapshot id)

* ``commit`` writes a new immutable snapshot directory + manifest; readers
  always resolve the latest manifest — writers never mutate published data
  (snapshot isolation, Iceberg's core contract).
* ``resume_pending`` = the checkpoint restart path: given the full
  partition-key list, anti-join against the partitions recorded in the
  latest manifest → only unprocessed partitions are recomputed.
* per-partition metrics (row counts; extensible) are recorded in the
  manifest at commit time — the lineage answer to "which input partition
  produced which file, with how many rows".

On a real cluster the same layout lands on object storage and commit is a
rename of the manifest (single-writer); here the filesystem stands in.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths ---
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _log_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_log")

    def snapshots(self, table: str) -> list[int]:
        log = self._log_dir(table)
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json")
        )

    def manifest(self, table: str, snapshot_id: int | None = None) -> dict:
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        sid = snapshot_id if snapshot_id is not None else snaps[-1]
        with open(os.path.join(self._log_dir(table), f"{sid:08d}.json")) as f:
            return json.load(f)

    # ------------------------------------------------------------ commit ---
    def commit(
        self,
        df: DataFrame,
        table: str,
        partition_col: str | None = None,
        extra_metrics: dict | None = None,
        attempted_partitions: list[str] | None = None,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Write df as the next snapshot of ``table``; returns the manifest.

        Lineage: per-partition row counts are computed in the SAME job
        shape as the write (one aggregate over the output), recorded under
        ``partitions`` in the manifest.

        ``stats_cols``: numeric columns whose per-file min/max are read
        from the parquet footers into the manifest (Iceberg's file-level
        column stats) — :meth:`load_pruned` uses them to skip whole files
        on range predicates without opening them.
        """
        snaps = self.snapshots(table)
        sid = (snaps[-1] + 1) if snaps else 1
        snap_dir = os.path.join(self._table_dir(table), f"snap-{sid:08d}")

        writer = df.write.mode("errorifexists")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(snap_dir)

        # Lineage WITHOUT recomputation: row counts come from the written
        # files' parquet footers (pure metadata, no second Spark job — the
        # old groupBy().count().collect() re-ran the entire upstream
        # lineage after the write, doubling every checkpointed stage at
        # scale).  On a real cluster these are the file-level stats an
        # Iceberg writer records in its manifests at commit.
        import urllib.parse

        import pyarrow.parquet as pq

        files = []
        file_stats = []
        counts: dict[str, int] = {}
        for dirpath, _dirs, fnames in os.walk(snap_dir):
            for f in fnames:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, snap_dir)
                md = pq.ParquetFile(full).metadata
                rows = md.num_rows
                files.append(rel)
                if partition_col:
                    # hive layout: <partition_col>=<url-encoded value>/...
                    pdir = rel.split(os.sep)[0]
                    pval = urllib.parse.unquote(pdir.split("=", 1)[1])
                else:
                    pval = "__all__"
                entry = {"path": rel, "rows": rows, "partition": pval}
                if stats_cols:
                    col_stats: dict[str, dict] = {}
                    for rg in range(md.num_row_groups):
                        for ci in range(md.num_columns):
                            cmd = md.row_group(rg).column(ci)
                            name = cmd.path_in_schema
                            if name not in stats_cols:
                                continue
                            st = cmd.statistics
                            if st is None or not st.has_min_max:
                                continue
                            prev = col_stats.get(name)
                            mn, mx = st.min, st.max
                            if prev is None:
                                col_stats[name] = {"min": mn, "max": mx}
                            else:
                                prev["min"] = min(prev["min"], mn)
                                prev["max"] = max(prev["max"], mx)
                    entry["stats"] = col_stats
                file_stats.append(entry)
                counts[pval] = counts.get(pval, 0) + rows
        if not partition_col:
            counts.setdefault("__all__", 0)
        # an attempted partition that produced zero rows is still DONE —
        # record it so resume converges instead of rescanning it forever
        for p in attempted_partitions or []:
            counts.setdefault(str(p), 0)

        manifest = {
            "table": table,
            "snapshot_id": sid,
            "parent_id": snaps[-1] if snaps else None,
            "created_unix": time.time(),
            "data_dir": snap_dir,
            "files": sorted(files),
            "file_stats": sorted(file_stats, key=lambda s: s["path"]),
            "partition_col": partition_col,
            "partitions": counts,
            "total_rows": sum(counts.values()),
            "metrics": extra_metrics or {},
        }
        log = self._log_dir(table)
        os.makedirs(log, exist_ok=True)
        tmp = os.path.join(log, f".{sid:08d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, os.path.join(log, f"{sid:08d}.json"))  # atomic publish
        return manifest

    # -------------------------------------------------------------- read ---
    def load(self, spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame:
        m = self.manifest(table, snapshot_id)
        return spark.read.parquet(m["data_dir"])

    def load_pruned(
        self,
        spark: SparkSession,
        table: str,
        col: str,
        lo,
        hi,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Read only the snapshot files whose manifest [min, max] range for
        ``col`` overlaps ``[lo, hi]``, then apply the exact predicate —
        semantically identical to ``load().filter(col BETWEEN lo AND hi)``
        but non-overlapping files are never opened (Iceberg manifest-level
        file pruning; combine with
        ``operators.skew.repartition_by_cell_range`` at write time so cell
        ranges land disjoint).  Files committed without stats for ``col``
        are conservatively read."""
        from pyspark.sql import functions as F

        m = self.manifest(table, snapshot_id)
        keep = []
        for fs in m["file_stats"]:
            st = (fs.get("stats") or {}).get(col)
            if st is None or (st["max"] >= lo and st["min"] <= hi):
                keep.append(os.path.join(m["data_dir"], fs["path"]))
        pred_src = spark.read.option("basePath", m["data_dir"])
        if not keep:
            df = spark.read.parquet(m["data_dir"]).limit(0)
        else:
            df = pred_src.parquet(*keep)
        return df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))

    def load_as_of(self, spark: SparkSession, table: str, as_of_unix: float) -> DataFrame:
        """Time travel: read the latest snapshot committed at or before
        ``as_of_unix`` (Iceberg's ``TIMESTAMP AS OF``)."""
        best = None
        for sid in self.snapshots(table):
            m = self.manifest(table, sid)
            if m["created_unix"] <= as_of_unix:
                best = sid
        if best is None:
            raise FileNotFoundError(
                f"no snapshot of {table!r} at or before {as_of_unix}"
            )
        return self.load(spark, table, best)

    def compact(
        self,
        spark: SparkSession,
        table: str,
        num_files: int,
        sort_col: str | None = None,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Small-file compaction: rewrite the latest snapshot's data into
        ``num_files`` files as a NEW snapshot (readers on older snapshots
        are untouched; ``expire_snapshots`` reclaims the old files later —
        Iceberg's rewrite_data_files action).  ``sort_col`` range-partitions
        + sorts the rewrite (e.g. the cell ID) so the compacted files carry
        tight min/max ranges for :meth:`load_pruned`."""
        df = self.load(spark, table)
        if sort_col:
            df = df.repartitionByRange(num_files, df[sort_col]).sortWithinPartitions(
                sort_col
            )
        else:
            df = df.coalesce(num_files)
        prev = self.manifest(table)
        return self.commit(
            df,
            table,
            extra_metrics={"compacted_from": prev["snapshot_id"]},
            stats_cols=stats_cols,
        )

    def rollback(self, table: str, snapshot_id: int) -> dict:
        """Publish a NEW manifest that points at an old snapshot's data —
        readers of 'latest' see the old state, history is preserved, no
        data files move (Iceberg's rollback semantics)."""
        old = self.manifest(table, snapshot_id)
        snaps = self.snapshots(table)
        sid = snaps[-1] + 1
        manifest = dict(
            old,
            snapshot_id=sid,
            parent_id=snaps[-1],
            created_unix=time.time(),
            metrics=dict(old.get("metrics") or {}, rolled_back_from=snapshot_id),
        )
        log = self._log_dir(table)
        tmp = os.path.join(log, f".{sid:08d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, os.path.join(log, f"{sid:08d}.json"))
        return manifest

    def expire_snapshots(self, table: str, keep_last: int = 2) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` manifests and
        delete data directories no kept manifest references (a rolled-back
        snapshot's data survives while any live manifest points at it).
        Returns the expired snapshot ids."""
        import shutil

        snaps = self.snapshots(table)
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        expired = snaps[:-keep_last] if len(snaps) > keep_last else []
        kept = [s for s in snaps if s not in expired]
        live_dirs = {self.manifest(table, s)["data_dir"] for s in kept}
        for sid in expired:
            m = self.manifest(table, sid)
            os.remove(os.path.join(self._log_dir(table), f"{sid:08d}.json"))
            if m["data_dir"] not in live_dirs and os.path.isdir(m["data_dir"]):
                shutil.rmtree(m["data_dir"])
        return expired

    def processed_partitions(self, table: str) -> set[str]:
        """Union over the full snapshot chain — a later incremental commit
        must not reset earlier snapshots' progress."""
        done: set[str] = set()
        for sid in self.snapshots(table):
            done |= set(self.manifest(table, sid)["partitions"])
        return done

    def resume_pending(
        self, spark: SparkSession, all_partitions: DataFrame, table: str, partition_col: str
    ) -> DataFrame:
        """Partitions of ``all_partitions`` NOT yet in the latest snapshot —
        the restart work-list (anti-join against manifest lineage)."""
        done = sorted(self.processed_partitions(table))
        if not done:
            return all_partitions
        from pyspark.sql import functions as F

        done_df = spark.createDataFrame(
            [(d,) for d in done], f"{partition_col}_done string"
        )
        return all_partitions.join(
            F.broadcast(done_df),
            all_partitions[partition_col].cast("string")
            == done_df[f"{partition_col}_done"],
            "left_anti",
        )
