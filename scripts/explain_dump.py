"""Dump ``.explain("formatted")`` for named catalog queries to
``plans/r{N}/<query>_<tag>.txt`` (the optimization-round evidence files).

Usage:
    python scripts/explain_dump.py --tag before d2_ngram_jaccard_pairs ...
    SPARK_GRAFT_PLANS_ROUND=14 python scripts/explain_dump.py --tag after ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypgsync_spark.queries import REGISTRY  # noqa: E402
from pypgsync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "14")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", f"r{ROUND}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
