"""Session-scoped Ray fixture (one ray.init per pytest session) + shared
synthetic-table fixtures."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_images_dir(tmp_path_factory) -> str:
    from stac_catalog_builder_ray.datagen import generate_images_table

    d = str(tmp_path_factory.mktemp("images-smoke"))
    return generate_images_table(d, smoke=True)


@pytest.fixture(scope="session")
def scale_images_dir(tmp_path_factory) -> str:
    from stac_catalog_builder_ray.datagen import generate_images_table

    d = str(tmp_path_factory.mktemp("images-scale"))
    return generate_images_table(d, n_rows=300, w=64, h=48)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
