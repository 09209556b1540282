"""A9/A10 parity surface: status snapshot + counters (jsmr_spark/status.py)."""

from jsmr_spark.io import load_table
from jsmr_spark.status import engine_status, run_with_counter
from tests.conftest import SF_DIR


def test_engine_status_snapshot(spark):
    st = engine_status(spark)
    assert st["app_id"] and st["master"].startswith("local")
    assert st["n_executors"] >= 1
    assert st["default_parallelism"] >= 1
    assert isinstance(st["active_job_ids"], list)


def test_counter_counts_rows(spark):
    df = load_table(spark, SF_DIR, "region")
    rows, counted = run_with_counter(df)
    assert len(rows) == 5
    assert counted == 5
