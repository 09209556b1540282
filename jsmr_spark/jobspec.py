"""Declarative job specifications — the reference's job-as-config model.

JsMr submits work as a JSON job description (input, stages, config)
plus user code; jsmr_spark/mr.py covers the user-code surface
(map/combine/reduce callables), and this module covers the CONFIG
surface: a JSON-serializable dict describing a relational pipeline,
compiled to a DataFrame plan. Expressions are Spark SQL strings
(`F.expr`), so a job spec is fully data — storable, diffable,
shippable over a wire — and everything still flows through Catalyst
(a spec op never forces materialization; the compiled job is one lazy
plan and optimizes across op boundaries).

Supported ops (each a dict with "op" plus fields):
  filter      {"expr": sql_predicate}
  derive      {"name": col, "expr": sql_expr}
  select      {"columns": {alias: sql_expr, ...}}
  group       {"keys": [col...], "aggs": {alias: sql_agg_expr, ...}}
  join        {"right": nested_spec, "on": [cols] | sql_expr,
               "how": join_type, "broadcast": bool}
  sort_limit  {"by": [sql_expr...], "n": int}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.io import load_table


def compile_job(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    """Compile a job spec to a (lazy) DataFrame plan."""
    df = load_table(spark, sf_dir, spec["source"])
    for op in spec.get("ops", []):
        kind = op["op"]
        if kind == "filter":
            df = df.filter(F.expr(op["expr"]))
        elif kind == "derive":
            df = df.withColumn(op["name"], F.expr(op["expr"]))
        elif kind == "select":
            df = df.select(
                *[F.expr(e).alias(a) for a, e in op["columns"].items()]
            )
        elif kind == "group":
            df = df.groupBy(*op["keys"]).agg(
                *[F.expr(e).alias(a) for a, e in op["aggs"].items()]
            )
        elif kind == "join":
            right = compile_job(spark, sf_dir, op["right"])
            if op.get("broadcast"):
                right = F.broadcast(right)
            on = op["on"]
            df = df.join(
                right,
                on if isinstance(on, list) else F.expr(on),
                op.get("how", "inner"),
            )
        elif kind == "sort_limit":
            df = df.orderBy(*[F.expr(e) for e in op["by"]]).limit(op["n"])
        else:
            raise ValueError(f"unknown job-spec op {kind!r}")
    return df
