"""Block-vectorized similarity kernels (numpy/BLAS over mapInPandas).

The HOF dot product in queries/similarity.py is the exact sequential
kernel — right for probe queries and for bit-exact oracle parity. For
ALL-PAIRS workloads it evaluates 64 multiply-adds per pair inside
codegen, which measured ~25s for 2M pairs at sf0.1. The scalable form
is block matrix multiplication:

  * the smaller side (or a tile of it) is broadcast to executors as a
    dense float64 matrix (N x 64 — ~0.5 MB per 1k vectors);
  * mapInPandas streams the bigger side in Arrow batches; each batch
    does ONE BLAS matmul (batch x dims) @ (dims x N) and emits only the
    pairs that clear a loose prefilter;
  * the exact engine-side round(sim, 4) >= tau filter is applied AFTER,
    in Spark, so the emitted semantics match the sequential kernel: the
    BLAS summation differs from sequential by ~1e-14, the loose margin
    (1e-6) guarantees no candidate is lost, and round(,4) collapses the
    difference before the final threshold.

At 100 TB neither side fits one broadcast: tile the broadcast side and
union the per-tile runs (outer loop over tiles of B, one mapInPandas
pass of A per tile) — same kernel, unchanged semantics; or prefilter
candidates with the LSH/MinHash paths (queries/ann.py, dedup.py) and
re-rank only candidates with the exact kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFILTER_MARGIN = 1e-6


def block_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    upper_triangle: bool = True,
) -> DataFrame:
    """All-pairs cosine similarity >= threshold via block GEMM.

    Returns (vec_a, vec_b, sim) with sim = round(cos, 4), vec_a < vec_b
    when upper_triangle. Matches the sequential-kernel semantics (see
    module docstring).
    """
    spark = emb.sparkSession
    side = emb.select(id_col, vec_col).toPandas()
    ids_b = side[id_col].to_numpy()
    mat_b = np.asarray([np.asarray(v, dtype=np.float64) for v in side[vec_col]])
    norms_b = np.sqrt((mat_b * mat_b).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids_b, mat_b, norms_b))
    cutoff = threshold - PREFILTER_MARGIN

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy()
            a_mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            if upper_triangle:
                mask = (sims >= cutoff) & (a_ids[:, None] < b_ids[None, :])
            else:
                mask = sims >= cutoff
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": b_ids[bi],
                    "sim_raw": sims[ai, bi],
                }
            )

    raw = emb.select(id_col, vec_col).mapInPandas(
        gemm, "vec_a long, vec_b long, sim_raw double"
    )
    return (
        raw.select("vec_a", "vec_b", F.round(F.col("sim_raw"), 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
