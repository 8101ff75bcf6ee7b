"""OP-09 — model binary sink: fit per-symbol models, persist as a parquet
table with a binary column, reload and predict (analysis_part/main.py:39-48
re-expressed as a model-registry table)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from stock_market_big_data_project_spark.operators.stats import (
    fit_models,
    predict_from_blob,
)
from stock_market_big_data_project_spark.sources.tables import load_table


def test_model_sink_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.col("user_id").alias("symbol"), F.col("ts"), F.col("value")
    )
    models = fit_models(series, "symbol", "ts", "value", n_lags=24)
    path = str(tmp_path / "models")
    models.write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    rows = back.collect()
    assert len(rows) > 0
    assert back.schema["model"].dataType.simpleString() == "binary"

    # reload one artifact and predict — finite, deterministic
    r = sorted(rows, key=lambda r: r.symbol)[0]
    window = np.linspace(90.0, 110.0, 24)
    p1 = predict_from_blob(bytes(r.model), window)
    p2 = predict_from_blob(bytes(r.model), window)
    assert np.isfinite(p1) and p1 == p2
    assert np.isfinite(r.rmse)
