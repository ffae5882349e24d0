"""spark-submit entry for the TRAINING-DATA side of the engine — the
corpus analogue of tools/crawl_main.py (the reference main.py shape):
run any registered corpus/webtext operator against a parquet data
directory and land the results, one JSON metrics line per operator.

    python tools/corpus_main.py --data /root/testdata/sf0.001 \
        --ops corpus_prep_pipeline,dedup_exact,text_langid \
        --out /tmp/corpus_out --master 'local[8]'

`--ops` takes registered query names (see --list); each result lands
as parquet under <out>/<op>/ and a line
{"op": ..., "rows": N, "sec": S} prints per op.  The operators are
the same DataFrame plans the oracle gates verify, so this CLI is the
production path for everything CORRECTNESS_r* covers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=False,
                    default="/root/testdata/sf0.001",
                    help="parquet table directory (sf dir layout)")
    ap.add_argument("--ops", default="corpus_prep_pipeline",
                    help="comma-separated registered operator names")
    ap.add_argument("--out", required=False, default=None,
                    help="output directory (parquet per op); metrics "
                         "only when omitted")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--list", action="store_true",
                    help="print registered operator names and exit")
    args = ap.parse_args()

    import __spark_entry__ as entry

    registry = entry.queries()
    if args.list:
        for name in registry:
            print(name)
        return 0
    wanted = [o.strip() for o in args.ops.split(",") if o.strip()]
    unknown = [o for o in wanted if o not in registry]
    if unknown:
        print(f"unknown ops: {unknown}; use --list", file=sys.stderr)
        return 2

    from goto_eater_crawler_spark.session import get_spark

    spark = get_spark("corpus-main", master=args.master,
                      shuffle_partitions=8)
    rc = 0
    for name in wanted:
        t0 = time.monotonic()
        try:
            df = registry[name](spark, args.data)
            if args.out:
                df.write.mode("overwrite").parquet(
                    str(Path(args.out) / name))
                rows = spark.read.parquet(
                    str(Path(args.out) / name)).count()
            else:
                rows = df.count()
            print(json.dumps({
                "op": name, "rows": rows,
                "sec": round(time.monotonic() - t0, 2),
            }))
        except Exception as exc:  # surface per-op failures, keep going
            rc = 1
            print(json.dumps({
                "op": name, "error": str(exc)[:200],
                "sec": round(time.monotonic() - t0, 2),
            }))
    return rc


if __name__ == "__main__":
    sys.exit(main())
