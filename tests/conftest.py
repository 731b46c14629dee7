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
def small_corpus():
    from readur_ray import synth

    return synth.make_corpus(400, seed=42, with_class=True)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory, small_corpus):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("corpus")
    pq.write_table(small_corpus.drop_columns(["_cls"]), str(d / "part-0.parquet"))
    return str(d)
