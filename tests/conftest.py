import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_portal():
    """A small deterministic portal shared across crawl tests."""
    from realestate_scraper_ray.config import PortalConfig
    from realestate_scraper_ray.sources.synth_portal import Portal

    return Portal(PortalConfig(
        regions=("pomorskie", "mazowieckie", "slaskie"),
        base_pages=3, page_size_scale=0.15))
