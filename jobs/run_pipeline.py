"""spark-submit entry point for the full ER pipeline.

    python scripts/package_pyfiles.py          # builds engine.zip
    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        --input /data/web_pages_parquet --catalog-root /data/er_catalog \
        --run-id run42 [--resume]

or locally:

    python jobs/run_pipeline.py --synth 20000 --catalog-root /tmp/er_cat

Reads a web_pages table (url, warc_ts, html, text, lang), runs
normalize → block → score → route → cluster → merge → observe with a
snapshot checkpoint per stage, and prints one JSON line with stage
timings, skip/resume info, and the quality-gate verdict.  Re-running
with the same --run-id resumes after the last committed stage
(north_rule checkpoint/resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet directory of web_pages")
    src.add_argument(
        "--synth", type=int, help="generate a deterministic corpus of ~N rows"
    )
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None, help="override master (local[N])")
    ap.add_argument(
        "--iceberg-catalog",
        default=None,
        help="use an Iceberg catalog by name instead of the parquet-snapshot catalog",
    )
    args = ap.parse_args()

    from entity_resolution_engine_spark.plans.pipeline import Pipeline
    from entity_resolution_engine_spark.session import get_spark
    from entity_resolution_engine_spark.sources.catalog import get_catalog

    spark = get_spark(app_name="er_pipeline", master=args.master)
    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        from entity_resolution_engine_spark.sources.synth import generate_web_pages

        pages, _ = generate_web_pages(spark, args.synth)

    run_id = args.run_id or uuid.uuid4().hex[:8]
    catalog = get_catalog(spark, args.catalog_root, args.iceberg_catalog)
    pipe = Pipeline(spark, args.catalog_root, catalog=catalog)
    res = pipe.run(pages, run_id=run_id)

    entities = pipe.table(run_id, "entities")
    out = {
        "run_id": run_id,
        "stages_run": res.stages_run,
        "stages_skipped": res.stages_skipped,
        "timings_sec": {k: round(v, 2) for k, v in res.timings.items()},
        "gate_passed": res.gate_passed,
        "n_entities": entities.count(),
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if res.gate_passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
