import pytest

from gotrackmaster_spark.session import get_session

FIXTURE_DIR = "/root/reference/testdata"
FIXTURES = {
    "pedraforca": f"{FIXTURE_DIR}/2020-10-03_09-05_Sat_pedraforca.gpx",
    "benitandus": f"{FIXTURE_DIR}/2020-12-19_11-14_Sat_benitandus.gpx",
    "sun": f"{FIXTURE_DIR}/2023-03-05_09-27_Sun.gpx",
    "carlos": f"{FIXTURE_DIR}/carlos_prades_cool_de_la_creu.gpx",
}


@pytest.fixture(scope="session")
def spark():
    s = get_session("gotrackmaster-tests", master="local[4]", shuffle_partitions=8)
    yield s


def load_fixture_segments(name):
    """Parse a GPX fixture into nested [trk][seg] -> list[Pt]."""
    from gotrackmaster_spark.kernels.track import Pt
    from gotrackmaster_spark.sources.gpx import parse_gpx_file

    g = parse_gpx_file(FIXTURES[name])
    return [[[Pt(*p) for p in seg] for seg in trk] for trk in g.tracks]
