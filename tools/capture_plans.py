"""Capture .explain('formatted') output for named keys to plans/<dir>/.

Usage: python tools/capture_plans.py <outdir-suffix> <key> [key ...]
   ex: python tools/capture_plans.py r12 --suffix _before q_agg_q1 ...

Writes plans/<outdir>/<key><suffix>.txt with the bench-harness session
confs (AQE off, local split sizing) so the captured plan is the plan
the bench actually executes.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def main() -> None:
    args = sys.argv[1:]
    outdir_name = args.pop(0)
    suffix = ""
    if args and args[0] == "--suffix":
        args.pop(0)
        suffix = args.pop(0)
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from jsmr_spark.registry import all_specs
    from jsmr_spark.session import get_spark

    spark = get_spark("jsmr_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", outdir_name)
    os.makedirs(outdir, exist_ok=True)
    for name in keys:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count("MapInPandas")
        print(f"{name}: {n_exch} Exchange, {n_py} python nodes -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
