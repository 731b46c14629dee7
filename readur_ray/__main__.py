"""CLI driver for the resumable extraction job — the `ray job submit`
entry point (replaces the reference's batch_ingest CLI + OCR worker
loop, /root/reference/src/bin/batch_ingest.rs:28-60).

    python -m readur_ray --input <parquet dir> --out <dir> \
        [--chunks 8] [--dedup-policy skip|track|allow] [--num-cpus N]
    python -m readur_ray --input <docs parquet> --out <dir> --curate

Safe to re-run after a crash: committed chunks are skipped via the
ledger (see readur_ray.pipelines.run). ``--curate`` runs the
training-data funnel (quality/lang gate → exact dedup) instead of
the extraction job.
"""

from __future__ import annotations

import argparse
import json
import sys


def ray_init_plan(env_addr: str | None, num_cpus: int | None):
    """(address, kwargs) for ray.init: attach when `ray job submit`
    (or any cluster) set RAY_ADDRESS; boot single-node otherwise.
    num_cpus is a local-boot knob only — never sent to a cluster."""
    if env_addr in (None, "", "local"):
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        return "local", kwargs
    return None, {"logging_level": "ERROR"}


def land_connector_input(out_dir: str, webdav_url: str | None = None,
                         spool_dir: str | None = None) -> tuple[str, str]:
    """S5/S6 connector ingest: land connector rows as a DOCUMENTS
    table under <out>/ingested/ (the reference's discover → download →
    ingest step) and return (input_path, media_resolver_spec) for the
    extraction job. The landing write is itself the resumable
    boundary: a crashed extraction re-run skips re-discovery."""
    import os
    import shutil

    ingested = os.path.join(out_dir, "ingested")
    if webdav_url:
        # incremental landing (round 5): stable per-directory shards +
        # an etag manifest — an unchanged share lands for free, a
        # partial mutation re-downloads only its shards, and unchanged
        # shard files keep their bytes so run_incremental's content
        # etags match and group chunks reuse. (The previous rmtree +
        # read_webdav().write_parquet() re-landed every file under
        # fresh random shard names: every re-run of a 100k-file share
        # was a full re-extraction.)
        from .sources.webdav import land_webdav

        ingested = land_webdav(
            out_dir,
            webdav_url,
            username=os.environ.get("READUR_WEBDAV_USERNAME", ""),
            password=os.environ.get("READUR_WEBDAV_PASSWORD", ""),
        )
        resolver = f"webdav:{webdav_url}"
    else:
        from .sources.upload import read_uploads

        shutil.rmtree(ingested, ignore_errors=True)
        ds = read_uploads(spool_dir)
        ds.write_parquet(ingested)
        resolver = f"spool:{spool_dir}"
    return ingested, resolver


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="readur_ray")
    ap.add_argument("--input", default=None, help="parquet dir/file of documents")
    ap.add_argument("--ingest-webdav", default=None, metavar="URL",
                    help="S6: discover a WebDAV share (base URL incl. mount), "
                         "land it as <out>/ingested/ DOCUMENTS rows, and "
                         "extract it (credentials via READUR_WEBDAV_USERNAME/"
                         "_PASSWORD; media stays lazy behind the webdav: "
                         "resolver)")
    ap.add_argument("--ingest-spool", default=None, metavar="DIR",
                    help="S5: read an upload spool directory into "
                         "<out>/ingested/ DOCUMENTS rows and extract it")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--dedup-policy", default="skip",
                    choices=["skip", "track", "allow"])
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--sim-ocr-ms", type=float, default=0.0)
    ap.add_argument("--incremental", action="store_true",
                    help="manifest-diff run: skip/full/targeted per the "
                         "smart-sync decision table (W2+W3+W4)")
    ap.add_argument("--incr-group", type=int, default=None,
                    help="input files per incremental pipeline launch "
                         "(default READUR_INCR_GROUP or 16; 1 = finest "
                         "targeted granularity, one launch per file)")
    ap.add_argument("--compact-ledger", action="store_true",
                    help="only fold old ledger chunk entries into a "
                         "snapshot (W6 TTL cleanup), then exit")
    ap.add_argument("--dedup-against", default=None,
                    help="prior run's final/ dir: content whose file_hash "
                         "already exists there is marked duplicate here "
                         "(J1 cross-run lookup)")
    ap.add_argument("--curate", action="store_true",
                    help="run the training-data curation funnel "
                         "(quality/lang gate -> exact dedup keep-first) "
                         "over a documents-shaped parquet instead of "
                         "the extraction job")
    ap.add_argument("--funnel", action="store_true",
                    help="run the FULL audited curation funnel "
                         "(benchmark -> gate -> exact dup -> fuzzy dup "
                         "-> contamination) over <input>/documents.parquet "
                         "and write the per-doc stage table to "
                         "<out>/funnel")
    args = ap.parse_args(argv)

    if args.compact_ledger:
        from .state.ledger import compact_ledger

        print(json.dumps({"compacted": compact_ledger(args.out)}))
        return 0

    import os

    import ray

    if not ray.is_initialized():
        addr, kwargs = ray_init_plan(os.environ.get("RAY_ADDRESS"), args.num_cpus)
        if addr is not None:
            ray.init(address=addr, **kwargs)
        else:
            ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import ExtractionConfig
    from .pipelines.run import run_extraction

    if args.curate:
        from .pipelines.prep import run_curation

        print(json.dumps(run_curation(args.input, args.out)))
        ray.shutdown()
        return 0

    if args.funnel:
        from .pipelines.prep import run_funnel

        print(json.dumps(run_funnel(args.input, args.out)))
        ray.shutdown()
        return 0

    if args.ingest_webdav or args.ingest_spool:
        input_path, resolver = land_connector_input(
            args.out, webdav_url=args.ingest_webdav, spool_dir=args.ingest_spool
        )
    elif args.input is not None:
        input_path, resolver = args.input, "synth"
    else:
        ap.error("one of --input / --ingest-webdav / --ingest-spool is required")

    cfg = ExtractionConfig(
        dedup_policy=args.dedup_policy,
        simulated_ocr_ms_per_page=args.sim_ocr_ms,
        media_resolver=resolver,
    )
    if args.incremental:
        from .pipelines.run import run_incremental

        summary = run_incremental(
            input_path, args.out, cfg, group_files=args.incr_group,
            dedup_against=args.dedup_against,
        )
    else:
        summary = run_extraction(
            input_path, args.out, cfg, n_chunks=args.chunks,
            dedup_against=args.dedup_against,
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
