"""operators/linalg.py: exact-lattice scatter matrix + power iteration."""

from __future__ import annotations

import math

import numpy as np
import pytest

from high_throughput_etl_pipeline_spark.operators.linalg import (
    power_top_eigvec,
    round_div,
    scatter_cells,
)


def test_round_div_half_away_from_zero():
    # mirrors Spark/DuckDB round() on exact rationals — the oracle replay
    # depends on every engine agreeing on these
    assert round_div(5, 2) == 3  # 2.5 -> 3
    assert round_div(-5, 2) == -3  # -2.5 -> -3
    assert round_div(4, 2) == 2
    assert round_div(7, 3) == 2  # 2.33 -> 2
    assert round_div(8, 3) == 3  # 2.67 -> 3
    assert round_div(-7, 3) == -2
    assert round_div(-8, 3) == -3
    assert round_div(1, 1000000) == 0
    assert round_div(500000, 1000000) == 1  # 0.5 -> 1
    # negative denominator normalizes
    assert round_div(5, -2) == -3


def test_round_div_matches_decimal_reference():
    from decimal import ROUND_HALF_UP, Decimal

    for num in range(-50, 51):
        for den in (1, 2, 3, 7, 10):
            want = int(
                (Decimal(num) / Decimal(den)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            assert round_div(num, den) == want, (num, den)


def test_power_iteration_finds_top_eigenvector():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(6, 6))
    m_f = a @ a.T  # symmetric PSD
    m_i = np.rint(m_f * 1000).astype(np.int64)
    m_i = (m_i + m_i.T) // 2  # keep exactly symmetric after rounding
    cells = [
        (i, j, int(m_i[i, j])) for i in range(6) for j in range(i, 6)
    ]
    v, vmv, vv, trace = power_top_eigvec(cells, dim=6, iters=40)
    # compare against numpy's top eigenvector (sign-aligned)
    w, vecs = np.linalg.eigh(m_i.astype(np.float64))
    top = vecs[:, np.argmax(w)]
    got = np.array(v, dtype=np.float64)
    got /= np.linalg.norm(got)
    if np.dot(got, top) < 0:
        top = -top
    assert np.allclose(got, top, atol=1e-4)
    # Rayleigh quotient ~ top eigenvalue
    lam = vmv / vv
    assert math.isclose(lam, float(np.max(w)), rel_tol=1e-6)
    assert trace == int(np.trace(m_i))


def test_power_iteration_sign_convention():
    # matrix whose top eigenvector is along -e1 after iteration: the
    # convention flips it so the max-|v| component is positive
    cells = [(0, 0, 100), (0, 1, -40), (1, 1, 50)]
    v, *_ = power_top_eigvec(cells, dim=2, iters=30)
    assert max(v, key=abs) > 0


def test_scatter_cells_matches_numpy(spark):
    rng = np.random.default_rng(11)
    data = rng.normal(scale=0.3, size=(40, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [([float(x) for x in row],) for row in data],
        "embedding array<float>",
    )
    cells, n, means_out = scatter_cells(df, "embedding", dim=5, scale=1000)
    assert n == 40

    # replay the exact quantized pipeline with half-away rounding
    # (Spark round(); np.rint would be half-even)
    def q(x: float) -> int:
        s = 1 if x >= 0 else -1
        return s * int(math.floor(abs(x) * 1000 + 0.5))

    xi = np.array([[q(float(x)) for x in row] for row in data], dtype=np.int64)
    mean = np.array(
        [round_div(int(s), 40) for s in xi.sum(axis=0)], dtype=np.int64
    )
    assert means_out == mean.tolist()
    dev = xi - mean
    want = dev.T @ dev
    got = np.zeros((5, 5), dtype=np.int64)
    for i, j, c in cells:
        got[i, j] = c
        got[j, i] = c
    assert (got == want).all()


def test_scatter_cells_empty(spark):
    df = spark.createDataFrame([], "embedding array<float>")
    cells, n, means = scatter_cells(df, "embedding", dim=4, scale=1000)
    assert cells == [] and n == 0 and means == []


def test_normal_equation_fit_matches_numpy_lstsq(spark):
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        normal_equation_fit,
    )

    rng = np.random.default_rng(3)
    rows = []
    for g in ("a", "b"):
        x1 = rng.integers(1, 50, size=60)
        x2 = rng.integers(0, 10, size=60)
        noise = rng.integers(-500, 500, size=60)
        y = 10_000 + 250 * x1 + (-90 if g == "a" else 40) * x2 + noise
        rows += [
            (g, int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)
        ]
    df = spark.createDataFrame(
        rows, "grp string, x1 bigint, x2 bigint, y bigint"
    )
    got = {
        r["grp"]: r
        for r in normal_equation_fit(
            df, "x1", "x2", "y", ["grp"], y_per_unit=100
        ).collect()
    }
    for g in ("a", "b"):
        sub = [r for r in rows if r[0] == g]
        X = np.array([[1.0, r[1], r[2]] for r in sub])
        yv = np.array([float(r[3]) for r in sub])
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        assert got[g]["n"] == 60
        assert abs(got[g]["b0"] - beta[0] / 100) < 1e-4
        assert abs(got[g]["b1"] - beta[1] / 100) < 1e-4
        assert abs(got[g]["b2"] - beta[2] / 100) < 1e-4
        pred = X @ beta
        sse = float(((yv - pred) ** 2).sum())
        sst = float(((yv - yv.mean()) ** 2).sum())
        assert abs(got[g]["r2"] - (1 - sse / sst)) < 1e-4


def test_normal_equation_fit_singular_group_is_null(spark):
    from high_throughput_etl_pipeline_spark.operators.linalg import (
        normal_equation_fit,
    )

    # x2 constant -> collinear with the intercept -> det = 0
    df = spark.createDataFrame(
        [("s", i, 7, 100 * i) for i in range(1, 20)],
        "grp string, x1 bigint, x2 bigint, y bigint",
    )
    (row,) = normal_equation_fit(
        df, "x1", "x2", "y", ["grp"], y_per_unit=100
    ).collect()
    assert row["n"] == 19
    assert row["b0"] is None and row["b1"] is None
    assert row["b2"] is None and row["r2"] is None
