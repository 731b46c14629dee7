import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    # workers inherit the driver env: make the repo root AND tests dir
    # importable in workers so test-defined actor classes (pickled by
    # reference to their top-level test module) can be unpickled there
    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _tests = os.path.join(_root, "tests")
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [p for p in (_root, _tests, os.environ.get("PYTHONPATH", "")) if p]
    )

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
