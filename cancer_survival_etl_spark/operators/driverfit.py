"""Driver-solve fast path for the iterative-fit family (r10).

The engine's fits (Cox/Fine-Gray/AFT/GLM Newton, EM, Fisher scoring)
are sufficient-statistics algorithms: after subjects collapse to
(x-pattern, duration, event)-style cells with counts, every iteration
is a deterministic fold over the cell frame. Round-10 probe data
(tools/probe_r10_opt.py) shows the per-iteration distributed fold is
dominated by FIXED per-job cost at any realistic cell count — ~0.14 s
on a 48-cell frame and ~1.4 s for the prefix-sum shape — so an
8-iteration fit pays 1–15 s of pure scheduling/planning latency for
microseconds of arithmetic.

This module gives each fit a bounded-collect escape hatch: when the
cell collapse is small (``max_cells``, the absorbing_chain bounded-
collect pattern), the cells are collected ONCE and the whole loop runs
on the driver in numpy on the IDENTICAL nano/pico lattice — the same
pure-Python twin semantics the pytest suite already pins bit-equal to
the distributed folds (tests/test_survival.py::_weibull_twin et al.).
Per-cell terms are rounded to exact int64 lattice points before
summation, so the driver solve is bit-identical to the distributed one
and trivially partitioning-invariant. When the collapse exceeds
``max_cells`` (continuous covariates at production scale), callers
fall back to the unchanged distributed loop — the only cost is the one
probe pass.

Scale posture (SCALE.md round 10): the ONE data-sized pass is the
map-side-combined cell collapse; the collect is bounded by
``max_cells`` (default 2^19 rows ≈ a few tens of MB at typical widths, far
under spark.driver.maxResultSize), exactly the discipline the
absorbing_chain / level-discovery collects already follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^19: covers every registry cohort whose duration axis is rounded to
# publication precision — and the near-continuous bench cohorts (e.g.
# the two-episode counting-process cohort, ~300k cells at sf0.1) —
# while bounding the driver transfer to a few tens of MB (2^19 rows ×
# ~6 numeric columns × 8 B ≈ 25 MB, far under the 1 GB
# spark.driver.maxResultSize). Cohorts beyond it (truly continuous
# covariates at production scale) use the distributed loop.
MAX_DRIVER_CELLS = 524288


def round_half_up(x):
    """numpy twin of Spark's ``F.round(expr, 0)`` — HALF_UP, i.e. ties
    round away from zero. ``np.rint`` rounds half-to-even, which
    diverges from the distributed fold on exact half-lattice points
    (dyadic inputs like k/1024 scaled by 1e9 = 2^9·5^9 land exactly on
    .5), so every driver twin must use this instead to keep the
    driver == distributed bit-equality contract."""
    import numpy as np

    return np.copysign(np.floor(np.abs(x) + 0.5), x)


def cells_clean(pdf, float_cols=(), notnull_cols=()):
    """True when every ``float_cols`` entry is non-null and finite and
    every ``notnull_cols`` entry is non-null — the guard a driver twin
    needs before trusting ``.astype(int64)`` lattice arithmetic (NaN
    becomes INT64_MIN garbage) and numpy group segmentation (each NaN
    duration is its own lexsort group where Spark keeps ONE null
    group). Callers fall back to the distributed fold on failure."""
    import numpy as np

    for c in float_cols:
        v = pdf[c]
        if v.isnull().any() or not np.isfinite(
            v.to_numpy(dtype=np.float64)
        ).all():
            return False
    for c in notnull_cols:
        if pdf[c].isnull().any():
            return False
    return True


def collect_cells(
    df: DataFrame,
    key_cols,
    max_cells: int = MAX_DRIVER_CELLS,
    weight_alias: str = "_w",
):
    """Collapse ``df`` to (key..., count) cells and collect them when
    bounded. ONE map-side-combined aggregate + ONE bounded collect
    (``limit(max_cells + 1)`` guards the transfer — the
    absorbing_chain pattern). Returns a pandas DataFrame or ``None``
    when the collapse exceeds ``max_cells`` (caller falls back to the
    distributed loop). ``max_cells <= 0`` disables the fast path
    outright (used by tests to pin both paths equal)."""
    if max_cells <= 0:
        return None
    cells = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias(weight_alias))
    pdf = cells.limit(max_cells + 1).toPandas()
    if len(pdf) > max_cells:
        return None
    return pdf
