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


def render_loss_svg(
    df: DataFrame,
    width: int = 640,
    height: int = 360,
    margin: int = 46,
) -> str:
    """The loss-curve PLOT itself (model.eval.py:34-53's matplotlib
    figure) as a standalone SVG string — no plotting dependency, so the
    one reference behavior previously declared "out of engine scope"
    ships and is testable byte-for-byte.

    Collects only the CURVES (one point per logged step — checkpoint
    metadata scale, never corpus scale), then lays out two polylines
    (train solid, val dashed with markers), axes with min/max/step
    ticks, and a legend, mirroring the reference figure's content:
    x = step, y = loss, both series on one plot.
    """
    train, val = loss_curves(df)
    t = [(r["step"], float(r["train_loss"])) for r in train.collect()]
    v = [(r["step"], float(r["val_loss"])) for r in val.collect()]
    pts = t + v
    if not pts:
        raise ValueError("no loss points to plot")
    x_lo, x_hi = min(p[0] for p in pts), max(p[0] for p in pts)
    y_lo, y_hi = min(p[1] for p in pts), max(p[1] for p in pts)
    x_span = (x_hi - x_lo) or 1
    y_span = (y_hi - y_lo) or 1.0
    iw, ih = width - 2 * margin, height - 2 * margin

    def sx(x: float) -> float:
        return round(margin + (x - x_lo) / x_span * iw, 2)

    def sy(y: float) -> float:
        return round(height - margin - (y - y_lo) / y_span * ih, 2)

    def poly(series, color: str, dash: str = "") -> str:
        path = " ".join(f"{sx(x)},{sy(y)}" for x, y in series)
        d = f' stroke-dasharray="{dash}"' if dash else ""
        return (
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5"'
            f'{d} points="{path}"/>'
        )

    marks = "".join(
        f'<circle cx="{sx(x)}" cy="{sy(y)}" r="2.5" fill="#d62728"/>'
        for x, y in v
    )
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}"'
        f' height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        # axes
        f'<line x1="{margin}" y1="{height - margin}" x2="{width - margin}"'
        f' y2="{height - margin}" stroke="black"/>',
        f'<line x1="{margin}" y1="{margin}" x2="{margin}"'
        f' y2="{height - margin}" stroke="black"/>',
        # tick labels (min/max on both axes)
        f'<text x="{margin}" y="{height - margin + 16}" font-size="10"'
        f' text-anchor="middle">{x_lo}</text>',
        f'<text x="{width - margin}" y="{height - margin + 16}"'
        f' font-size="10" text-anchor="middle">{x_hi}</text>',
        f'<text x="{margin - 6}" y="{sy(y_lo) + 3}" font-size="10"'
        f' text-anchor="end">{y_lo:.3f}</text>',
        f'<text x="{margin - 6}" y="{sy(y_hi) + 3}" font-size="10"'
        f' text-anchor="end">{y_hi:.3f}</text>',
        f'<text x="{width / 2}" y="{height - 8}" font-size="11"'
        f' text-anchor="middle">step</text>',
        f'<text x="14" y="{height / 2}" font-size="11" text-anchor="middle"'
        f' transform="rotate(-90 14 {height / 2})">loss</text>',
    ]
    if t:
        parts.append(poly(t, "#1f77b4"))
    if v:
        parts.append(poly(v, "#d62728", dash="4 3"))
        parts.append(marks)
    # legend
    lx = width - margin - 110
    parts += [
        f'<line x1="{lx}" y1="{margin + 6}" x2="{lx + 24}" y2="{margin + 6}"'
        f' stroke="#1f77b4" stroke-width="1.5"/>',
        f'<text x="{lx + 30}" y="{margin + 9}" font-size="10">train_loss</text>',
        f'<line x1="{lx}" y1="{margin + 20}" x2="{lx + 24}"'
        f' y2="{margin + 20}" stroke="#d62728" stroke-width="1.5"'
        f' stroke-dasharray="4 3"/>',
        f'<text x="{lx + 30}" y="{margin + 23}" font-size="10">val_loss</text>',
        "</svg>",
    ]
    return "".join(parts)
