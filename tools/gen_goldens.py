"""Regenerate golden outputs for rows-only keys at sf0.001 (SURVEY.md
§5.2.5). Run deliberately; goldens are checked in."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime

from jsmr_spark.registry import canonical_specs
from jsmr_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def canon(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return {k: canon(x) for k, x in sorted(v.items())}
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    return v


def main():
    spark = get_spark("goldens")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in canonical_specs().items():
        if spec.oracle is not None:
            continue
        df = spec.fn(spark, SF_DIR)
        cols = df.columns
        rows = sorted([canon(list(r)) for r in df.collect()], key=json.dumps)
        with open(os.path.join(OUT, f"{name}.json"), "w") as f:
            json.dump({"columns": cols, "rows": rows}, f, indent=1)
        print(f"{name}: {len(rows)} rows")


if __name__ == "__main__":
    main()
