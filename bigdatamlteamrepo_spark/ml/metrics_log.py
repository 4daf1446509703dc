"""Training-metrics time series ops (SURVEY M22, model.py:238-253 /
model.eval.py:34-53): the loss-curve queries over a Lightning
``metrics.csv``-shaped log.

Reference semantics reproduced:
  * ``dropna(subset=["train_loss","val_loss"], how="all")``
    (model.py:242) → ``na.drop(how='all', subset=...)``
  * per-column ``notna()`` filtering (model.eval.py:39)
  * step-ordered curves; epoch-level aggregation of the val series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def clean_metrics(df: DataFrame) -> DataFrame:
    """Drop rows where BOTH losses are null (P6, how='all')."""
    return df.na.drop(how="all", subset=["train_loss", "val_loss"])


def loss_curves(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(train_curve, val_curve): step-ordered non-null series."""
    cleaned = clean_metrics(df)
    train = cleaned.filter(F.col("train_loss").isNotNull()).select(
        "step", "epoch", "train_loss"
    ).orderBy("step")
    val = cleaned.filter(F.col("val_loss").isNotNull()).select(
        "step", "epoch", "val_loss"
    ).orderBy("step")
    return train, val


def epoch_summary(df: DataFrame) -> DataFrame:
    """Per-epoch mean losses + best-so-far val loss (running min window:
    the ModelCheckpoint(monitor='val_loss') decision sequence)."""
    per_epoch = clean_metrics(df).groupBy("epoch").agg(
        F.avg("train_loss").alias("mean_train_loss"),
        F.avg("val_loss").alias("mean_val_loss"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    w = Window.orderBy("epoch").rowsBetween(Window.unboundedPreceding, 0)
    return per_epoch.withColumn(
        "best_val_so_far", F.min("mean_val_loss").over(w)
    ).orderBy("epoch")


def best_epoch(df: DataFrame) -> DataFrame:
    """The epoch a checkpoint monitor would keep (min mean val loss,
    earliest on ties)."""
    return (
        epoch_summary(df)
        .filter(F.col("mean_val_loss").isNotNull())
        .orderBy(F.asc("mean_val_loss"), F.asc("epoch"))
        .limit(1)
        .select("epoch", "mean_val_loss")
    )
