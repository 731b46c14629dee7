"""W4-adjacent: an extraction actor dying MID-RUN must not drop or
duplicate rows — Ray re-creates the actor and re-executes the lost
task from lineage (the engine-level analog of the reference's
stale-job recovery, /root/reference/src/ocr/queue.rs:1101-1121)."""

import os

import pyarrow as pa

from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.extract import (
    UnifiedExtractor,
    classify_batch,
    load_documents,
    route_filter,
)


class CrashOnceExtractor(UnifiedExtractor):
    """Kills its process on the first __call__ unless the crash marker
    already exists (exactly one actor dies exactly once per run)."""

    marker = "/tmp/readur_crash_once.marker"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self.marker):
            open(self.marker, "w").close()
            os._exit(1)
        # explicit base call: the class is cloudpickled BY VALUE into
        # the actor (test module isn't importable there), which breaks
        # zero-arg super()'s __class__ cell
        return UnifiedExtractor.__call__(self, batch)


def test_actor_death_does_not_drop_rows(ray_session, corpus_dir):
    if os.path.exists(CrashOnceExtractor.marker):
        os.remove(CrashOnceExtractor.marker)
    cfg = ExtractionConfig()
    ds = (
        load_documents(corpus_dir)
        .map_batches(lambda b: classify_batch(b, cfg), batch_format="pyarrow")
        .map_batches(route_filter("main", cfg), batch_format="pyarrow")
        .map_batches(
            CrashOnceExtractor, fn_constructor_args=(cfg,),
            batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1,
            max_restarts=-1, max_task_retries=-1,
        )
    )
    rows = ds.take_all()
    assert os.path.exists(CrashOnceExtractor.marker), "crash never triggered"
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # every main-branch doc present exactly once despite the crash
    expected = load_documents(corpus_dir).map_batches(
        lambda b: classify_batch(b, cfg), batch_format="pyarrow"
    ).map_batches(route_filter("main", cfg), batch_format="pyarrow").count()
    assert len(ids) == expected
    os.remove(CrashOnceExtractor.marker)
