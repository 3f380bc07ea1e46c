"""Unit tests for the §2.12 UDF surface: pins the rows-only kernels
(z-score grouped map, trimmed-mean UDAF) against independent numpy, and
demonstrates the row-at-a-time @udtf API the registered query's
explode(sequence()) form replaces."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.plans.q_udf import (
    ZSCORE_SCHEMA, _trimmed_mean_fn, _zscore_kernel)


def test_zscore_kernel_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vals = rng.normal(100, 15, 50)
    df = spark.createDataFrame(
        [(i, i % 3, float(v)) for i, v in enumerate(vals)],
        "event_id long, user_id long, value double")
    out = df.groupBy("user_id").applyInPandas(
        _zscore_kernel, schema=ZSCORE_SCHEMA).collect()
    by_user = {}
    for i, v in enumerate(vals):
        by_user.setdefault(i % 3, []).append((i, v))
    expect = {}
    for u, pairs in by_user.items():
        arr = np.array([v for _, v in pairs])
        z = (arr - arr.mean()) / arr.std(ddof=1)
        expect.update({eid: zz for (eid, _), zz in zip(pairs, z)})
    for r in out:
        assert r["z"] == pytest.approx(expect[r["event_id"]], abs=1e-9)


def test_zscore_constant_group_is_zero(spark):
    df = spark.createDataFrame(
        [(i, 0, 5.0) for i in range(4)],
        "event_id long, user_id long, value double")
    out = df.groupBy("user_id").applyInPandas(
        _zscore_kernel, schema=ZSCORE_SCHEMA).collect()
    assert all(r["z"] == 0.0 for r in out)


def test_trimmed_mean_drops_outliers():
    import pandas as pd
    v = pd.Series([1.0] * 9 + [1000.0])   # 10% trim drops the outlier
    assert _trimmed_mean_fn(v) == pytest.approx(
        np.mean(sorted(v)[1:9]))
    small = pd.Series([1.0, 2.0])          # too small to trim
    assert _trimmed_mean_fn(small) == pytest.approx(1.5)


def test_python_udtf_api(spark):
    """The @udtf class form — same expansion as the registered
    explode(sequence()) query, via the Python table-function API."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="installment: int")
    class Installments:
        def eval(self, n: int):
            for i in range(n):
                yield (i,)

    out = Installments(lit(3)).collect()
    assert [r["installment"] for r in out] == [0, 1, 2]
