"""Driver-facing queries + DuckDB oracles (the correctness gate).

Every operator from SURVEY.md §2 that is SQL-expressible appears here twice
with IDENTICAL semantics: a Spark DataFrame builder (the engine path — cell
joins, broadcast coverings, pandas-UDF refinement) and an ANSI-SQL string
the driver runs through DuckDB on the same parquet tables.

Determinism rules used throughout (so value-hashes match bit-for-bit or to
a rounding guard):

* Geo columns are SYNTHESIZED from integer keys with exact int64 modular
  arithmetic followed by one exact float division — both engines produce
  identical float64 bits.
* Float aggregates are rounded (the two engines may sum in different
  orders; libm sin/cos can differ in the last ULP) — rounding granularity
  chosen so the residual error is ~10 orders of magnitude below the step.
* Rankings order by (rounded metric, id) in BOTH engines, so last-ULP
  metric differences cannot reorder rows.

The geotag layout mirrors the graft contract (BASELINE.json input_hint):
``events`` plays the geotagged fact table; each event is a "track point"
with ``user_id`` as the track key, exactly how the images table carries
(lat, lon, ele, ts, track_id, pt_idx).
"""

from __future__ import annotations

# Facade: the query/oracle corpus lives in the dq_* domain modules
# (split round 4 for reviewability); every name — public and
# underscore-prefixed (each module lists its defs in __all__) — is
# re-exported here so `driver_queries.<name>` stays the one import
# surface for __spark_entry__, bench.py and the tests.
from gotrackmaster_spark.dq_common import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_spatial import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_spatialstats import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_images import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_text import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_graph import *  # noqa: F401,F403,E402
from gotrackmaster_spark.dq_relational import *  # noqa: F401,F403,E402
