"""Driver-materialization bound (round-5 verdict ask #7): to_pandas on
a result larger than the bound must raise instead of silently
materializing a data-sized table on the driver."""

import pyarrow as pa
import pytest
import ray.data as rd

from realestate_scraper_ray import driverbound


def test_gate_installed():
    assert getattr(rd.Dataset.to_pandas, driverbound._SENTINEL, False)
    driverbound.install()  # idempotent: no double-wrap
    assert getattr(getattr(rd.Dataset.to_pandas, "__wrapped__"),
                   driverbound._SENTINEL, False) is False


def test_bounded_result_passes(ray_session):
    df = rd.range(100).to_pandas()
    assert len(df) == 100


def test_oversized_result_raises(ray_session, monkeypatch):
    monkeypatch.setattr(driverbound, "DRIVER_BOUND_ROWS", 50)
    # re-install with the tiny bound: the wrapper reads the module
    # constant at call time only if not captured — verify behavior
    ds = rd.range(100)
    with pytest.raises(ValueError, match="limit"):
        ds.to_pandas()


def test_explicit_bound_escape_hatch(ray_session):
    df = driverbound.to_driver(rd.range(100), bound=1000)
    assert len(df) == 100
    with pytest.raises(ValueError, match="limit"):
        driverbound.to_driver(rd.range(100), bound=50)
