"""Seq2seq recipe-generator data pipeline (the reference's model.py T5
workload) re-expressed Spark-first.

The reference is a single-process pandas script: per-row ``.apply`` for
every preprocessing step, HF Dataset on the driver, Lightning training.
Here each stage is a distributed DataFrame op:

  F7  stringified-list parse  → ``from_json`` with startswith guard
      (model.py:56-58 ``ast.literal_eval if s.startswith('[')``)
  F8  regex word extraction   → ``regexp_extract_all`` (model.py:71)
  F9  stopword removal        → NLTK english set ∪ 12 custom terms
      (model.py:50-54); the english list ships with Spark's
      StopWordsRemover so no NLTK dependency is needed
  F10 lemmatization           → pandas_udf wrapping NLTK *if available*,
      else a deterministic suffix-stripping fallback (the container has
      no NLTK; the Spark-side plumbing — Arrow batching, broadcast —
      is real either way)
  F11 prompt/target templating → concat / array_join / transform-with-
      index (numbered steps), pure expressions
  M16 HF tokenization          → iterator pandas_udf producing
      array<int> columns (stubbed BPE: deterministic hash tokenizer
      when transformers isn't installed; identical signature/shape)
  M14 T5 fine-tune             → TorchDistributor wrapper, gated behind
      import-try (no torch in container): raises NotImplementedError
      with the exact launch recipe documented
  M15 beam-search generation   → iterator pandas_udf shape, same gating

Train/val/test split: the reference's two-stage sklearn split
(90/10 then 85/15, model.py:90-91) = 76.5/13.5/10 overall →
``randomSplit([0.765, 0.135, 0.10])`` (R3; Bernoulli vs exact-count
semantics noted in FIXTURES §6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUSTOM_STOPWORDS = [
    "recipe", "want", "need", "make", "cook", "prepare", "food", "with",
    "and", "create", "dish", "meal",
]

_stopwords_cache: set[str] | None = None


def stopwords() -> set[str]:
    """NLTK english stopwords ∪ custom additions (model.py:50-54).
    Spark's StopWordsRemover default english list is the same public
    snowball set; loaded lazily (needs a live JVM)."""
    global _stopwords_cache
    if _stopwords_cache is None:
        from pyspark.ml.feature import StopWordsRemover

        _stopwords_cache = set(
            StopWordsRemover.loadDefaultStopWords("english")
        ) | set(CUSTOM_STOPWORDS)
    return _stopwords_cache

_ARR = T.ArrayType(T.StringType())


# ---------------------------------------------------------------------------
# F7 — stringified-python-list parsing
# ---------------------------------------------------------------------------


def parse_stringified_list(col: Column | str) -> Column:
    """``ast.literal_eval(s) if s.startswith('[') else [s]`` with a
    fall-back to the raw string on parse failure (model.py:56-58).

    ``from_json`` handles the JSON-compatible subset (the RecipeNLG
    encoding uses double quotes); single-quoted python lists are
    normalized first.  A failed parse yields NULL → fall back to
    ``array(s)`` like the reference's ``except: return str(s)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    # two parse attempts: as-is (RecipeNLG's double-quoted JSON lists),
    # then naive single→double quote normalization (python-repr lists);
    # a failed from_json is NULL → coalesce to the raw-string fallback,
    # mirroring the reference's `except: return str(s)`.
    singleq = F.regexp_replace(c, "'", '"')
    return F.when(
        c.startswith("["),
        F.coalesce(F.from_json(c, _ARR), F.from_json(singleq, _ARR), F.array(c)),
    ).otherwise(F.array(c))


# ---------------------------------------------------------------------------
# F11 — bullet / numbered joins and prompt templates
# ---------------------------------------------------------------------------


def bullet_join(items: Column) -> Column:
    """``"\\n".join(f"- {item.strip()}" for item in items if item.strip())``"""
    kept = F.filter(items, lambda x: F.trim(x) != "")
    return F.array_join(F.transform(kept, lambda x: F.concat(F.lit("- "), F.trim(x))), "\n")


def numbered_join(items: Column) -> Column:
    """``"\\n".join(f"{i+1}. {step.strip()}" ...)`` — transform's index
    argument covers the enumerate (model.py:65)."""
    kept = F.filter(items, lambda x: F.trim(x) != "")
    return F.array_join(
        F.transform(
            kept,
            lambda x, i: F.concat((i + 1).cast("string"), F.lit(". "), F.trim(x)),
        ),
        "\n",
    )


# ---------------------------------------------------------------------------
# F8/F9/F10 — tokenize, stopword-filter, lemmatize
# ---------------------------------------------------------------------------


def extract_words(col: Column | str) -> Column:
    """``re.findall(r"\\b[a-zA-Z]+\\b", text.lower())`` (model.py:71)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("([a-zA-Z]+)"), 1)


def remove_stopwords(words: Column) -> Column:
    """Filter against the english ∪ custom stopword set — as a literal
    array membership test (stays in codegen; the set is ~190 terms)."""
    sw = F.array(*[F.lit(w) for w in sorted(stopwords())])
    return F.filter(words, lambda x: ~F.array_contains(sw, x))


def _fallback_lemmatize(word: str) -> str:
    """Deterministic poor-man's lemmatizer used when NLTK is absent:
    strips common English inflection suffixes (documented stub — the
    semantics of WordNet lemmatization need the WordNet corpus)."""
    for suf in ("sses", "ies"):
        if word.endswith(suf):
            return word[: -len(suf)] + ("ss" if suf == "sses" else "y")
    if word.endswith("s") and not word.endswith("ss") and len(word) > 3:
        return word[:-1]
    return word


@F.pandas_udf(T.ArrayType(T.StringType()))
def lemmatize_words(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched lemmatization (F10).  Loads NLTK's WordNetLemmatizer
    once per worker if installed; otherwise uses the suffix fallback.
    Iterator form so the model/corpus loads once per partition, not per
    batch (model.py:50 does this once per process)."""
    try:
        from nltk.stem import WordNetLemmatizer  # type: ignore

        lem = WordNetLemmatizer().lemmatize
    except Exception:
        lem = _fallback_lemmatize
    for s in batches:
        yield s.map(lambda ws: [lem(w) for w in ws] if ws is not None else None)


def preprocess_text(col: Column | str) -> Column:
    """Full F8+F9+F10 chain with the ``or "unknown"`` guard
    (model.py:70-72): empty result → literal 'unknown'."""
    words = remove_stopwords(extract_words(col))
    lemmed = lemmatize_words(words)
    joined = F.array_join(lemmed, " ")
    return F.when(joined == "", F.lit("unknown")).otherwise(joined)


# ---------------------------------------------------------------------------
# End-to-end preprocessing (get_dataloaders' DataFrame half, model.py:80-96)
# ---------------------------------------------------------------------------


def preprocess_recipes(df: DataFrame) -> DataFrame:
    """RecipeNLG-shaped input (title, ingredients, directions as
    stringified lists) → (input_text, target_text) pairs."""
    ing_list = parse_stringified_list("ingredients")
    dir_list = parse_stringified_list("directions")
    ingredients = bullet_join(ing_list)
    directions = numbered_join(dir_list)
    processed = preprocess_text(ingredients)
    return df.select(
        F.concat(F.lit("Generate a structured recipe for: "), processed).alias("input_text"),
        F.concat(
            F.lit("Title: "), F.col("title"),
            F.lit("\nIngredients:\n"), ingredients,
            F.lit("\nDirections:\n"), directions, F.lit("\n"),
        ).alias("target_text"),
    )


def split_recipes(df: DataFrame, seed: int = 42):
    """76.5/13.5/10 train/val/test (two-stage sklearn split collapsed)."""
    return df.randomSplit([0.765, 0.135, 0.10], seed=seed)


# ---------------------------------------------------------------------------
# M16 — tokenization as an iterator pandas_udf producing padded ids
# ---------------------------------------------------------------------------


def _hash_tokenize(text: str, max_len: int) -> list[int]:
    """Deterministic stub tokenizer (no `transformers` in container):
    whitespace+BPE-ish split, ids = stable hash mod vocab, padded/truncated
    to max_len with 0 (= pad).  Shape-identical to HF output."""
    import zlib

    toks = text.split()
    ids = [1 + (zlib.crc32(t.encode()) % 31_998) for t in toks][: max_len - 1]
    ids.append(1)  # eos
    return ids + [0] * (max_len - len(ids))


def tokenize_pairs(
    df: DataFrame, input_max_len: int = 128, target_max_len: int = 256
) -> DataFrame:
    """(input_text, target_text) → input_ids / attention_mask / labels
    arrays with the reference's pad lengths (model.py:103-118).

    Uses HF's t5-small tokenizer when `transformers` is importable,
    else the deterministic stub — either way an Arrow-batched iterator
    pandas_udf, loading the tokenizer once per partition (U4).
    """

    def make_udf(max_len: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def tok(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            try:
                from transformers import AutoTokenizer  # type: ignore

                hf = AutoTokenizer.from_pretrained("t5-small")

                def enc(t):
                    return hf(t, padding="max_length", truncation=True, max_length=max_len)["input_ids"]
            except Exception:
                def enc(t):
                    return _hash_tokenize(t, max_len)
            for s in batches:
                yield s.map(enc)

        return tok

    enc_in = make_udf(input_max_len)
    enc_tgt = make_udf(target_max_len)
    out = df.withColumn("input_ids", enc_in("input_text")).withColumn(
        "labels", enc_tgt("target_text")
    )
    return out.withColumn(
        "attention_mask",
        F.transform("input_ids", lambda x: F.when(x != 0, 1).otherwise(0)),
    )


# ---------------------------------------------------------------------------
# M14/M15 — training + generation (torch not in container: gated)
# ---------------------------------------------------------------------------

TRAIN_CONFIG = {
    # model.py:137-200 hyperparameters, recorded for the distributor path
    "model": "t5-small",
    "lr": 1e-4,
    "epochs": 15,
    "batch_size": 8,
    "precision": "16-mixed",
    "gradient_clip_val": 1.0,
    "accumulate_grad_batches": 2,
    "limit_train_batches": 0.5,
    "limit_val_batches": 0.2,
    "monitor": "val_loss",
}


def fit_t5(
    train_df: DataFrame,
    val_df: DataFrame,
    output_dir: str,
    num_processes: int = 1,
    use_gpu: bool = False,
    config: dict | None = None,
) -> dict:
    """Fine-tune T5 on tokenized (input_ids/attention_mask/labels)
    DataFrames — the full reference schedule (model.py:137-200): AdamW
    lr=1e-4, fp16-on-GPU, grad-clip 1.0, accumulate 2, limit 0.5/0.2,
    val-loss-monitored checkpoint, Lightning-shaped ``metrics.csv``.

    The loop itself lives in :mod:`.t5_train` — its schedule /
    checkpoint / logging core is torch-free and pytest-pinned; the only
    torch-gated piece is the model leaf (``make_torch_module``).  This
    wrapper writes the token frames to parquet and dispatches
    ``t5_train.train_fn`` — through ``TorchDistributor`` when
    ``num_processes > 1`` (each worker reads the shared parquet), else
    directly in-process.  Raises :class:`NotImplementedError` only when
    ``import torch`` itself fails (this container).
    """
    try:
        import torch  # noqa: F401
    except Exception as exc:
        raise NotImplementedError(
            "torch/transformers not installed in this environment; the "
            "full training loop is implemented in ml/t5_train.py and "
            "activates as soon as torch is importable (TRAIN_CONFIG "
            "holds the reference hyperparameters)"
        ) from exc
    import os

    from .t5_train import train_fn

    cfg = dict(TRAIN_CONFIG)
    cfg.update(config or {})
    train_path = os.path.join(output_dir, "tokens_train.parquet")
    val_path = os.path.join(output_dir, "tokens_val.parquet")
    cols = ["input_ids", "attention_mask", "labels"]
    train_df.select(*cols).write.mode("overwrite").parquet(train_path)
    val_df.select(*cols).write.mode("overwrite").parquet(val_path)
    if num_processes > 1:
        from pyspark.ml.torch.distributor import TorchDistributor

        return TorchDistributor(
            num_processes=num_processes, local_mode=False, use_gpu=use_gpu
        ).run(train_fn, train_path, val_path, cfg, output_dir)
    return train_fn(train_path, val_path, cfg, output_dir)


def format_generated(col: Column | str) -> Column:
    """The reference's structured-output cleanup (model.py:228-231 /
    model.eval.py): a decoded generation is returned as-is when it
    already carries the ``Title:`` / ``Ingredients:`` / ``Directions:``
    skeleton, else prefixed with ``Generated Recipe:\\n`` — as a pure
    Column expression, so the post-processing of a billion generations
    stays inside codegen."""
    c = F.col(col) if isinstance(col, str) else col
    structured = (
        c.contains("Title:")
        & c.contains("Ingredients:")
        & c.contains("Directions:")
    )
    return F.when(structured, c).otherwise(
        F.concat(F.lit("Generated Recipe:\n"), c)
    )


#: filename of the deterministic stub decoder inside a model_dir
_STUB_DECODER = "stub_decoder.json"


def save_stub_decoder(model_dir: str, vocab: list[str] | None = None) -> str:
    """Write the deterministic stub decoder 'model' to *model_dir* —
    the torch-free stand-in that lets the generation UDF's plumbing
    (model-dir load once per partition, Arrow-batched iterator
    pandas_udf, beam loop) execute in this container (VERDICT_r7 #5)."""
    import json
    import os

    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "vocab": vocab
        or [
            "mix", "bake", "stir", "add", "heat", "serve",
            "flour", "sugar", "salt", "butter", "eggs", "milk",
        ],
        "salt": "stub-t5",
    }
    path = os.path.join(model_dir, _STUB_DECODER)
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def _stub_beam_decode(
    model: dict, text: str, num_beams: int, max_steps: int
) -> str:
    """Deterministic beam search over the stub decoder: candidate
    scores are stable hashes of (input context, previous token,
    candidate, step), so the top-``num_beams`` frontier and the final
    argmax are reproducible anywhere.  Structurally the same loop a
    real decoder runs — expand each beam over the vocab, keep the best
    ``num_beams`` by cumulative score."""
    import zlib

    vocab, salt = model["vocab"], model["salt"]
    ctx = zlib.crc32(f"{salt}|{text}".encode())
    beams: list[tuple[tuple[int, ...], int]] = [((), 0)]
    for step in range(max_steps):
        cands = []
        for seq, score in beams:
            prev = seq[-1] if seq else -1
            for i in range(len(vocab)):
                s = zlib.crc32(f"{salt}|{ctx}|{prev}|{i}|{step}".encode()) % 1000
                cands.append((seq + (i,), score + s))
        cands.sort(key=lambda c: (-c[1], c[0]))
        beams = cands[:num_beams]
    return " ".join(vocab[i] for i in beams[0][0])


def generate_recipes_udf(model_dir: str, num_beams: int = 4, max_length: int = 256):
    """Beam-search generation (M15) as an iterator pandas_udf factory:
    the model loads once per executor from *model_dir*, batches stream
    via Arrow.

    A *model_dir* containing a stub decoder (written by
    :func:`save_stub_decoder`) takes priority regardless of what's
    installed — the stub is an explicit artifact, so its deterministic
    pinned tests keep passing even after torch lands in the container
    (ADVICE_r8 #4).  Otherwise the real T5 path loads the HF model from
    *model_dir* (beam search, early stopping — model.py:207-231); if
    torch/transformers are absent or fail to import for ANY reason
    (version-mismatch RuntimeError/OSError included, not just
    ImportError) a model_dir without a stub raises NotImplementedError.
    """
    import json
    import os

    stub_path = os.path.join(model_dir, _STUB_DECODER)
    if not os.path.exists(stub_path):
        try:
            import torch  # noqa: F401
            from transformers import (  # noqa: F401
                AutoTokenizer,
                T5ForConditionalGeneration,
            )
        except Exception as exc:
            raise NotImplementedError(
                "torch/transformers not importable and no stub decoder at "
                f"{stub_path}; run save_stub_decoder(model_dir) for the "
                "torch-free plumbing path"
            ) from exc

        @F.pandas_udf(T.StringType())
        def gen_real(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # model + tokenizer load once per partition (U4); batches
            # stream via Arrow (model.py:207-231 generate_recipe,
            # vectorized over the batch instead of one prompt at a time)
            import torch
            from transformers import AutoTokenizer, T5ForConditionalGeneration

            tok = AutoTokenizer.from_pretrained(model_dir)
            model = T5ForConditionalGeneration.from_pretrained(model_dir).eval()
            device = "cuda" if torch.cuda.is_available() else "cpu"
            model.to(device)
            for s in batches:
                enc = tok(
                    list(s),
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                    max_length=256,
                ).to(device)
                with torch.no_grad():
                    out = model.generate(
                        **enc,
                        max_length=max_length,
                        num_beams=num_beams,
                        early_stopping=True,
                    )
                yield pd.Series(tok.batch_decode(out, skip_special_tokens=True))

        return gen_real
    steps = min(max_length, 8)  # stub sequences stay short

    @F.pandas_udf(T.StringType())
    def gen(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        with open(stub_path) as f:  # once per partition, not per row
            model = json.load(f)
        for s in batches:
            yield s.map(
                lambda t: _stub_beam_decode(model, t, num_beams, steps)
            )

    return gen
