"""gotrackmaster_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the ``inode64/gotrackmaster`` GPX analytics CLI (reference at
``/root/reference``), re-expressed Spark-first:

* Layer K — the reference's deterministic geospatial kernels (max-speed fix,
  noise/stop removal, Gaussian smoothing, time repair, quality scores,
  classification, degree-grid tiling) as vectorized pandas/Arrow UDFs over a
  columnar track-points table, matching the Go test fixtures point-for-point.
* Layer E — scale-out machinery the reference lacks: hierarchical cell index
  (S2-style Hilbert/Z quadtree), point-in-polygon joins via broadcast packed
  coverings, kNN via k-ring expansion, raster<->vector tile assignment,
  salt-and-broadcast skew handling, snapshot checkpoint/lineage.

Everything is DataFrame-API first; Python only runs inside Arrow-batched
pandas UDFs / applyInPandas kernels.
"""

__version__ = "0.1.0"

from gotrackmaster_spark.session import get_session  # noqa: F401
