import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ml_data_pipeline_ray.context import tune_data_context
    tune_data_context(4)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    """Deterministic tiny-scale transcripts + changelog on disk."""
    from ml_data_pipeline_ray.fixtures import write_fixture_set

    root = str(tmp_path_factory.mktemp("cdc_tiny"))
    paths = write_fixture_set(root, scale="tiny", seed=42, n_files=8)
    return paths
