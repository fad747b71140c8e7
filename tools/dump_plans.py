"""Dump .explain('formatted') for named registry rows to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX row [row ...]
  -> OUTDIR/<row>_<SUFFIX>.txt

The plan captured is the row's RETURNED DataFrame (what the bench
materializes through the noop sink). Fixture-building rows execute
their fixture commits as a side effect of calling fn() — the captured
plan is then the final graded read, which is the recurring cost at
scale; library-internal plan evidence (e.g. a relay's ops plan) is
captured separately where an optimization targets it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.parity import REGISTRY  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, rows = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lfs-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in rows:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
