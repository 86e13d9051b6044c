"""Operational entry point: run the curation pipeline or materialize
training shards from the command line / spark-submit.

    python -m cancer_survival_etl_spark.cli curate \
        --input /data/docs.parquet --eval /data/eval.parquet \
        --output /data/curated --min-quality 0.3

    python -m cancer_survival_etl_spark.cli shards \
        --input /data/curated --output /data/shards \
        --epochs 3 --seq-len 2048 --salt run1

On a cluster the same module runs under ``spark-submit`` (the session
factory defers to SPARK_MASTER / submit-provided master); locally it
self-hosts on local[N]. Every stage is the library operator — the CLI
adds argument parsing and a stage-count report, nothing else, so
pipeline behaviour is exactly what the tests pin.
"""

from __future__ import annotations

import argparse
import json
import sys


def _curate(args) -> int:
    from cancer_survival_etl_spark.llm.pipeline import (
        curate_corpus,
        stage_counts,
    )
    from cancer_survival_etl_spark.session import get_spark

    spark = get_spark("curate")
    docs = spark.read.parquet(args.input)
    eval_docs = spark.read.parquet(args.eval) if args.eval else None
    curated, stages = curate_corpus(
        docs,
        eval_docs=eval_docs,
        min_quality=args.min_quality,
        salt=args.salt,
    )
    curated.write.mode("overwrite").parquet(args.output)
    report = {
        name: df.count() for name, df in stages
    }
    report["written"] = spark.read.parquet(args.output).count()
    print(json.dumps(report))
    return 0


def _shards(args) -> int:
    from cancer_survival_etl_spark.llm.pipeline import materialize_epochs
    from cancer_survival_etl_spark.session import get_spark

    spark = get_spark("shards")
    docs = spark.read.parquet(args.input)
    manifest = materialize_epochs(
        docs,
        args.output,
        n_epochs=args.epochs,
        seq_len=args.seq_len,
        salt=args.salt,
    )
    rows = manifest.orderBy("epoch", "bin_id").collect()
    print(
        json.dumps(
            {
                "epochs": args.epochs,
                "bins": len(rows),
                "tokens": sum(r["n_tokens"] for r in rows),
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cancer_survival_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("curate", help="run the corpus curation recipe")
    c.add_argument("--input", required=True)
    c.add_argument("--eval", default=None)
    c.add_argument("--output", required=True)
    c.add_argument("--min-quality", type=float, default=0.3)
    c.add_argument("--salt", default="")
    c.set_defaults(fn=_curate)

    s = sub.add_parser("shards", help="materialize training shards")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--epochs", type=int, default=1)
    s.add_argument("--seq-len", type=int, default=2048)
    s.add_argument("--salt", default="")
    s.set_defaults(fn=_shards)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
