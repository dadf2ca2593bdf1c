"""Shared fixtures.  Ray is initialised ONCE per pytest session (tests that
need it depend on ``ray_session``); the corpus fixture generates a small
deterministic synthetic site under /tmp, reused across the session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """~220-page single-host corpus (conformance scale)."""
    from crawler_ray.corpus import generate_corpus
    out = str(tmp_path_factory.mktemp("corpus") / "sf_small")
    info = generate_corpus(out, n_pages=220, n_hosts=1, seed=42)
    return {"dir": out, **info}


@pytest.fixture(scope="session")
def multihost_corpus(tmp_path_factory):
    """3-host Zipf corpus (skew / sharding tests)."""
    from crawler_ray.corpus import generate_corpus
    out = str(tmp_path_factory.mktemp("corpus") / "sf_multi")
    info = generate_corpus(out, n_pages=300, n_hosts=3, seed=7)
    return {"dir": out, **info}
