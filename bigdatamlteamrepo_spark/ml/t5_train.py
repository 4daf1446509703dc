"""T5 fine-tune training loop (SURVEY M14, reference model.py:137-200).

The reference trains ``SimpleRecipeT5`` — a Lightning module wrapping
``T5ForConditionalGeneration`` — with

  * AdamW lr=1e-4                       (model.py:164-165)
  * max_epochs=15, log_every_n_steps=10 (model.py:181-182)
  * fp16 on GPU / fp32 on CPU           (model.py:184)
  * gradient_clip_val=1.0               (model.py:185)
  * limit_train_batches=0.5 / limit_val_batches=0.2 (model.py:186-187)
  * accumulate_grad_batches=2           (model.py:188)
  * ModelCheckpoint(monitor='val_loss', save_top_k=1, mode='min',
    filename='simple-t5-{epoch:02d}-{val_loss:.2f}') (model.py:170-176)
  * CSVLogger → ``<root>/<name>/version_N/metrics.csv``  (model.py:167)

This module separates that workload into

  1. a TORCH-FREE trainer core — :class:`TrainerLoop` drives the exact
     Lightning schedule (epoch loop, batch limits, gradient-accumulation
     boundaries, step-interval logging, per-epoch validation, monitored
     checkpointing) against an abstract module protocol, so every
     scheduling decision is unit-tested in this container with a numpy
     fake module (tests/test_t5_train.py);
  2. pure-Python scaffolding — :class:`MetricsCsvLogger` (Lightning
     CSVLogger file contract, consumed by ``ml/metrics_log.py``),
     :class:`CheckpointMonitor` (save_top_k=1 min-monitor decisions),
     :func:`limit_batches`, :func:`shuffled_batches`, :func:`collate`,
     :func:`read_token_parquet` — all torch-free and tested;
  3. the torch-gated leaf — :func:`make_torch_module` /
     :func:`train_fn`: the ONLY condition on this code path is
     ``import torch`` / ``import transformers`` succeeding; everything
     else (schedule, logging, checkpoint policy, data plumbing) runs
     and is pinned without them.

``train_fn`` is module-level and picklable so
``pyspark.ml.torch.distributor.TorchDistributor(...).run(train_fn,
train_path, val_path, config, out_dir)`` can ship it to executors;
single-process local training calls it directly.
"""

from __future__ import annotations

import csv
import math
import os
from collections.abc import Callable, Sequence
from dataclasses import asdict, dataclass, field

__all__ = [
    "TrainConfig",
    "MetricsCsvLogger",
    "CheckpointMonitor",
    "TrainerLoop",
    "limit_batches",
    "shuffled_batches",
    "collate",
    "checkpoint_filename",
    "read_token_parquet",
    "make_torch_module",
    "train_fn",
]


# ---------------------------------------------------------------------------
# config (model.py:164-188 hyperparameters)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    """The reference Trainer/optimizer hyperparameters as one record."""

    model: str = "t5-small"
    lr: float = 1e-4
    max_epochs: int = 15
    batch_size: int = 8
    gradient_clip_val: float = 1.0
    accumulate_grad_batches: int = 2
    limit_train_batches: float = 0.5
    limit_val_batches: float = 0.2
    log_every_n_steps: int = 10
    monitor: str = "val_loss"
    mode: str = "min"
    save_top_k: int = 1
    precision: str = "16-mixed"  # applied only when CUDA is available
    seed: int = 42

    def __post_init__(self) -> None:
        if self.max_epochs < 1:
            raise ValueError("max_epochs must be >= 1")
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        if self.accumulate_grad_batches < 1:
            raise ValueError("accumulate_grad_batches must be >= 1")
        if self.mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {self.mode!r}")
        if isinstance(self.limit_train_batches, float) and not (
            0.0 <= self.limit_train_batches <= 1.0
        ):
            raise ValueError("fractional limit_train_batches must be in [0, 1]")
        if isinstance(self.limit_val_batches, float) and not (
            0.0 <= self.limit_val_batches <= 1.0
        ):
            raise ValueError("fractional limit_val_batches must be in [0, 1]")

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        """Build from a plain dict (the TorchDistributor wire format),
        tolerating the legacy TRAIN_CONFIG key spelling."""
        d = dict(d)
        if "epochs" in d:  # legacy TRAIN_CONFIG name
            d["max_epochs"] = d.pop("epochs")
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_dict(self) -> dict:
        return asdict(self)


def limit_batches(n_batches: int, limit: float | int) -> int:
    """Lightning ``limit_train_batches`` semantics: a float in [0,1] is
    a fraction (at least 1 batch when the limit is nonzero and data
    exists); an int is an absolute cap."""
    if isinstance(limit, bool):  # bool is an int subclass; reject explicitly
        raise TypeError("limit must be float or int, not bool")
    if isinstance(limit, float):
        if n_batches == 0 or limit == 0.0:
            return 0
        return max(1, int(n_batches * limit))
    return min(n_batches, max(0, limit))


def checkpoint_filename(epoch: int, val_loss: float) -> str:
    """``simple-t5-{epoch:02d}-{val_loss:.2f}.ckpt`` (model.py:173)."""
    return f"simple-t5-{epoch:02d}-{val_loss:.2f}.ckpt"


# ---------------------------------------------------------------------------
# CSVLogger contract (model.py:167; consumed by ml/metrics_log.py)
# ---------------------------------------------------------------------------


class MetricsCsvLogger:
    """Lightning-CSVLogger-shaped metrics sink.

    File contract (what model.py:238-242 / model.eval.py:34-39 read
    back): ``<root>/<name>/version_<N>/metrics.csv`` whose header is
    the union of logged metric keys plus ``epoch`` and ``step``, one
    row per ``log_metrics`` call, blanks for keys a row didn't log —
    so train rows have empty ``val_loss`` and vice versa, and pandas /
    Spark read those blanks as NaN/NULL (the ``dropna(how='all')``
    behavior in ``ml/metrics_log.clean_metrics`` depends on this).
    """

    def __init__(self, root: str, name: str = "recipe_model"):
        base = os.path.join(root, name)
        os.makedirs(base, exist_ok=True)
        existing = [
            int(d.split("_", 1)[1])
            for d in os.listdir(base)
            if d.startswith("version_") and d.split("_", 1)[1].isdigit()
        ]
        self.version = max(existing) + 1 if existing else 0
        self.log_dir = os.path.join(base, f"version_{self.version}")
        os.makedirs(self.log_dir, exist_ok=True)
        self.path = os.path.join(self.log_dir, "metrics.csv")
        self._rows: list[dict] = []
        self._keys: list[str] = []

    def log_metrics(self, metrics: dict, step: int, epoch: int) -> None:
        row = {**metrics, "epoch": epoch, "step": step}
        for k in row:
            if k not in self._keys:
                self._keys.append(k)
        self._rows.append(row)

    def save(self) -> str:
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys)
            w.writeheader()
            w.writerows({k: r.get(k, "") for k in self._keys} for r in self._rows)
        return self.path


class CheckpointMonitor:
    """``ModelCheckpoint(monitor, save_top_k=1, mode)`` decision logic
    (model.py:170-176): called once per validation epoch; returns the
    filename to save when the monitored value improves (and the stale
    previous-best filename to delete, save_top_k=1), else ``None``."""

    def __init__(self, mode: str = "min", save_top_k: int = 1):
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
        self.mode = mode
        self.save_top_k = save_top_k
        self.best: float | None = None
        self.best_path: str | None = None

    def update(self, epoch: int, value: float) -> tuple[str | None, str | None]:
        """→ (filename_to_save | None, filename_to_delete | None)."""
        if value is None or math.isnan(value):
            return None, None
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if not improved:
            return None, None
        stale = self.best_path if self.save_top_k == 1 else None
        self.best = value
        self.best_path = checkpoint_filename(epoch, value)
        return self.best_path, stale


# ---------------------------------------------------------------------------
# data plumbing: deterministic batching + collation + parquet reader
# ---------------------------------------------------------------------------


def shuffled_batches(
    n_rows: int, batch_size: int, seed: int, shuffle: bool = True
) -> list[list[int]]:
    """Row-index batches; shuffle is a seeded permutation so the train
    loader order (DataLoader(shuffle=True), model.py:130) is
    reproducible across runs and workers."""
    idx = list(range(n_rows))
    if shuffle and n_rows > 1:
        import numpy as np

        idx = list(np.random.RandomState(seed).permutation(n_rows))
    return [idx[i : i + batch_size] for i in range(0, n_rows, batch_size)]


def collate(
    rows: Sequence[dict], keys: Sequence[str] = ("input_ids", "attention_mask", "labels")
) -> dict[str, list]:
    """List-of-row-dicts → dict-of-column-lists (the DataLoader default
    collate shape, pre-tensorization).  Raises on a missing key so a
    schema drift fails loudly instead of training on garbage."""
    out: dict[str, list] = {k: [] for k in keys}
    for r in rows:
        for k in keys:
            if k not in r:
                raise KeyError(f"row missing required column {k!r}")
            out[k].append(r[k])
    return out


def read_token_parquet(
    path: str, keys: Sequence[str] = ("input_ids", "attention_mask", "labels")
) -> list[dict]:
    """Tokenized parquet (written by ``tokenize_pairs`` output) → list
    of row dicts, via pyarrow — no Spark session needed inside the
    training process (the TorchDistributor worker reads its shard
    directly)."""
    import pyarrow.dataset as ds

    table = ds.dataset(path, format="parquet").to_table(columns=list(keys))
    cols = {k: table.column(k).to_pylist() for k in keys}
    return [dict(zip(keys, vals)) for vals in zip(*(cols[k] for k in keys))]


# ---------------------------------------------------------------------------
# the trainer core — torch-free, Lightning-equivalent schedule
# ---------------------------------------------------------------------------


class TrainerLoop:
    """Drives the reference Trainer's schedule against an abstract
    module.  The module contract (duck-typed; implemented by the numpy
    fake in tests and by :func:`make_torch_module` for real training):

      * ``training_step(batch) -> float`` — forward + backward on the
        accumulation-scaled loss; returns the UNscaled loss value
      * ``validation_step(batch) -> float`` — forward only
      * ``optimizer_step(clip_val) -> None`` — clip grads, step, zero
      * ``save(dirpath, filename) -> None`` — persist a checkpoint

    Schedule reproduced from model.py:178-189 / Lightning semantics:
    per epoch, iterate ``limit_batches``-capped train batches; the
    optimizer steps every ``accumulate_grad_batches`` batches AND on
    the final (possibly short) window of the epoch; ``train_loss`` is
    logged every ``log_every_n_steps`` optimizer steps; validation runs
    after each train epoch over its own capped batches, logs the mean
    ``val_loss``, and feeds the checkpoint monitor.
    """

    def __init__(
        self,
        config: TrainConfig,
        logger: MetricsCsvLogger,
        checkpoint_dir: str | None = None,
    ):
        self.cfg = config
        self.logger = logger
        self.checkpoint_dir = checkpoint_dir
        self.monitor = CheckpointMonitor(config.mode, config.save_top_k)
        self.global_step = 0  # optimizer steps, Lightning's global_step
        self.saved: list[str] = []  # checkpoint filenames, in save order

    def fit(
        self,
        module,
        train_batches: Callable[[int], Sequence],
        val_batches: Sequence,
    ) -> dict:
        """``train_batches(epoch)`` → that epoch's (pre-limit) batch
        sequence (a callable so each epoch can reshuffle); returns a
        summary dict with the best monitored value and step counts."""
        cfg = self.cfg
        val_list = list(val_batches)
        n_val = limit_batches(len(val_list), cfg.limit_val_batches)
        for epoch in range(cfg.max_epochs):
            epoch_list = list(train_batches(epoch))
            n_train = limit_batches(len(epoch_list), cfg.limit_train_batches)
            window = 0
            for bi in range(n_train):
                loss = module.training_step(epoch_list[bi])
                window += 1
                if window == cfg.accumulate_grad_batches or bi == n_train - 1:
                    module.optimizer_step(cfg.gradient_clip_val)
                    self.global_step += 1
                    window = 0
                    if self.global_step % cfg.log_every_n_steps == 0:
                        self.logger.log_metrics(
                            {"train_loss": loss}, self.global_step, epoch
                        )
            if n_val:
                vlosses = [module.validation_step(b) for b in val_list[:n_val]]
                val_loss = sum(vlosses) / len(vlosses)
                self.logger.log_metrics(
                    {"val_loss": val_loss}, self.global_step, epoch
                )
                fname, stale = self.monitor.update(epoch, val_loss)
                if fname and self.checkpoint_dir:
                    module.save(self.checkpoint_dir, fname)
                    self.saved.append(fname)
                    if stale:
                        stale_path = os.path.join(self.checkpoint_dir, stale)
                        if os.path.isdir(stale_path):
                            import shutil

                            shutil.rmtree(stale_path)
                        elif os.path.exists(stale_path):
                            os.remove(stale_path)
        self.logger.save()
        return {
            "best_val_loss": self.monitor.best,
            "best_checkpoint": self.monitor.best_path,
            "global_steps": self.global_step,
            "metrics_csv": self.logger.path,
        }


# ---------------------------------------------------------------------------
# the torch leaf — real model; the ONLY gate is the import
# ---------------------------------------------------------------------------


def make_torch_module(config: TrainConfig):
    """Build the torch module implementing the TrainerLoop contract:
    ``T5ForConditionalGeneration`` + AdamW(lr) + fp16 autocast/GradScaler
    on CUDA (model.py:137-165,184).  Imports happen here and nowhere
    else on the training path — with torch+transformers installed this
    returns a ready module; without them the ImportError propagates to
    the caller's gate."""
    import torch
    from torch.optim import AdamW
    from transformers import T5ForConditionalGeneration

    device = "cuda" if torch.cuda.is_available() else "cpu"
    use_amp = device == "cuda" and config.precision.startswith("16")

    class _TorchRecipeT5:
        """The SimpleRecipeT5 equivalent (model.py:137-165), plus the
        Trainer-owned mechanics (scaled backward, clip, AMP) that
        Lightning injects around it."""

        def __init__(self) -> None:
            self.model = T5ForConditionalGeneration.from_pretrained(config.model)
            self.model.to(device)
            self.optimizer = AdamW(self.model.parameters(), lr=config.lr)
            self.scaler = torch.cuda.amp.GradScaler(enabled=use_amp)

        def _tensors(self, batch: dict) -> dict:
            return {
                k: torch.tensor(batch[k], dtype=torch.long, device=device)
                for k in ("input_ids", "attention_mask", "labels")
            }

        def training_step(self, batch: dict) -> float:
            self.model.train()
            t = self._tensors(batch)
            with torch.autocast(device_type=device, enabled=use_amp):
                loss = self.model(**t).loss
            # Lightning scales the backward by 1/accumulate_grad_batches
            self.scaler.scale(loss / config.accumulate_grad_batches).backward()
            return float(loss.detach())

        def validation_step(self, batch: dict) -> float:
            self.model.eval()
            t = self._tensors(batch)
            with torch.no_grad(), torch.autocast(device_type=device, enabled=use_amp):
                return float(self.model(**t).loss)

        def optimizer_step(self, clip_val: float) -> None:
            self.scaler.unscale_(self.optimizer)
            torch.nn.utils.clip_grad_norm_(self.model.parameters(), clip_val)
            self.scaler.step(self.optimizer)
            self.scaler.update()
            self.optimizer.zero_grad(set_to_none=True)

        def save(self, dirpath: str, filename: str) -> None:
            # HF-format directory per checkpoint (loadable by
            # T5ForConditionalGeneration.from_pretrained)
            self.model.save_pretrained(os.path.join(dirpath, filename))

    return _TorchRecipeT5()


def train_fn(
    train_path: str,
    val_path: str,
    config_dict: dict,
    output_dir: str,
) -> dict:
    """The distributable training entrypoint: reads tokenized parquet,
    runs the full reference schedule, writes checkpoints + the final
    model + Lightning-shaped ``metrics.csv`` under *output_dir*.

    Module-level and argument-picklable so
    ``TorchDistributor(...).run(train_fn, ...)`` can ship it; a local
    run calls it directly (``fit_t5`` does both)."""
    cfg = TrainConfig.from_dict(config_dict)
    module = make_torch_module(cfg)  # the torch gate lives in here
    train_rows = read_token_parquet(train_path)
    val_rows = read_token_parquet(val_path)

    def train_batches(epoch: int):
        # fresh seeded shuffle each epoch (DataLoader shuffle=True)
        return [
            collate([train_rows[i] for i in b])
            for b in shuffled_batches(
                len(train_rows), cfg.batch_size, cfg.seed + epoch
            )
        ]

    val = [
        collate([val_rows[i] for i in b])
        for b in shuffled_batches(len(val_rows), cfg.batch_size, 0, shuffle=False)
    ]
    ckpt_dir = os.path.join(output_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    loop = TrainerLoop(cfg, MetricsCsvLogger(os.path.join(output_dir, "logs")), ckpt_dir)
    summary = loop.fit(module, train_batches, val)
    module.save(output_dir, "saved_model")  # model.py:203 final save
    return summary
