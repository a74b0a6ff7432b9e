"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic pages+taxonomy fixture on disk (seed=42, 500 pages)."""
    from fashion_knowledge_graph_ray.datagen import ensure_fixture_dir

    root = str(tmp_path_factory.mktemp("fkgr"))
    return ensure_fixture_dir(root, seed=42, n_pages=500, n_entities=500)
