"""In-engine multinomial Naive Bayes: closed-form distributed training
plus broadcast scoring, both with engine-replayable arithmetic.

This is the second trained-model family in the repo (the first,
``operators/probe.py``, is an iterative gradient trainer).  Naive
Bayes is the classic *generative* text classifier behind
CCNet/DSIR-style domain and quality gates: train P(token | class) from
labeled examples, then route or reweight the unlabeled corpus by
argmax posterior.  Unlike the probe, training is CLOSED-FORM — the
entire "fit" is one token-count aggregation — which makes it the
cheapest possible in-engine trainer at 100 TB: no epochs, no driver
state beyond class/vocab cardinalities, and the count tables are
map-side-combinable (partial aggregation IS the sufficient statistic).

Exact-replay discipline (the repo's oracle recipes):

* token log-likelihoods are ``ROUND(LN((c + α) / (tc + α·V)), 6)`` —
  the division is IEEE-identical across engines given the identical
  operand expression; LN is rounded to 6 decimals because libm
  implementations differ in the last ulp;
* per-document scores sum the rounded log-probs as scaled BIGINTs
  (``FLOOR(logp6·1e6 + 0.5)``), so partition order can never change a
  bit — float addition is not associative, integer addition is;
* argmax posterior breaks ties deterministically (score DESC, label
  ASC), so the prediction column hash-compares across engines.

Scale (100 TB): training touches the corpus once (tokenize + one
grouped count); the model is ``V × C`` rows — Zipf-bounded via
``max_vocab`` with a deterministic (tf DESC, token ASC) cut — and is
broadcast for scoring, so scoring is a map-side join + one grouped
integer sum.  Nothing shuffles wider than the (label, token) count
table.

Reference scope: the reference engine (/root/reference/src/lib.rs) is
inference-only (LightGBM UDF); training surfaces are a §2.4 extension,
same class as ``probe.train_linear_probe``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Scaled-int factor for associative log-prob sums (6 decimals kept).
_M = 1e6


def _tokens(df: DataFrame, text_col: str):
    """Whitespace tokens of ``lower(text)``, empties dropped — the
    corpus-wide tokenizer convention (== DuckDB
    ``string_split_regex(lower(text), '\\s+')``)."""
    return F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")


def train_naive_bayes(
    df: DataFrame,
    label_col: str,
    text_col: str,
    alpha: float = 1.0,
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with add-``alpha`` smoothing.  Returns
    ``(priors, token_logps)``:

    * ``priors``: one row per class — ``(label, logprior6)`` with
      ``logprior6 = ROUND(LN(n_docs_class / n_docs), 6)``;
    * ``token_logps``: one row per (class, vocab token) —
      ``(label, token, logp6)`` with
      ``logp6 = ROUND(LN((c + α) / (tc + α·V)), 6)`` where ``c`` is the
      class's count of the token, ``tc`` its total count over the
      vocabulary, and ``V`` the vocabulary size.  Every (class, vocab
      token) pair is present (smoothing fills the zeros), so the model
      broadcast is exactly ``V × C`` rows.

    ``max_vocab`` Zipf-bounds the vocabulary to the top-N tokens by
    corpus frequency (ties broken by token ASC — deterministic across
    partitionings); None keeps every token.  NULL labels or texts are
    refused loudly: a NULL label would train a phantom class, a NULL
    text would silently contribute nothing while still counting toward
    its class prior.
    """
    # ONE validation/count job instead of two separate scans (r17): the
    # NULL-guard count and the doc total ride the same aggregation.
    guard = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col(label_col).isNull() | F.col(text_col).isNull(), 1
                )
            ),
            F.lit(0),
        ).alias("_bad"),
    ).collect()[0]
    n_total, n_bad = guard["_n"], guard["_bad"]
    if n_bad:
        raise ValueError(
            f"train_naive_bayes: {n_bad} rows carry NULL {label_col}/"
            f"{text_col} — a NULL label trains a phantom class and a NULL "
            "text skews its class prior. Filter or impute upstream."
        )
    # Degenerate-parallelism guard (r17): fan the projected rows out so
    # tokenize+explode runs wide on single-split scans; the (label,
    # token) counts are exact integers — partitioning-proof.
    from .fanout import fan_out

    src = fan_out(df.select(label_col, text_col))
    toks = src.select(
        F.col(label_col).alias("label"), _tokens(src, text_col)
    ).where(F.col("token") != "")
    # Lazy checkpoint: the vocabulary count below materializes the
    # Zipf-bounded (label, token) table once at build time, so the
    # scoring action reuses it instead of re-running the corpus
    # tokenize for every one of its three plan occurrences (tf/vocab,
    # class totals, the dense grid join).
    counts = (
        toks.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tf = counts.groupBy("token").agg(F.sum("c").alias("tf"))
    if max_vocab is not None:
        vocab = tf.orderBy(F.col("tf").desc(), "token").limit(int(max_vocab))
    else:
        vocab = tf
    vocab = vocab.select("token")
    v_size = vocab.count()  # bounded driver scalar (≤ max_vocab)
    if v_size == 0:
        raise ValueError("train_naive_bayes: empty vocabulary")
    in_vocab = counts.join(F.broadcast(vocab), "token")
    tc = in_vocab.groupBy("label").agg(F.sum("c").alias("tc"))
    classes = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    priors = classes.select(
        "label",
        F.round(
            F.log(
                F.col("n_docs").cast("double") / F.lit(float(n_total))
            ),
            6,
        ).alias("logprior6"),
    )
    # Dense V × C grid: every class sees every vocab token (the
    # smoothing floor), zero counts filled by the left join.
    token_logps = (
        classes.select("label")
        .crossJoin(F.broadcast(vocab))
        .join(in_vocab.select("label", "token", "c"), ["label", "token"], "left")
        .join(tc, "label")
        .select(
            "label",
            "token",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                    / (
                        F.col("tc").cast("double")
                        + F.lit(float(alpha)) * F.lit(float(v_size))
                    )
                ),
                6,
            ).alias("logp6"),
        )
    )
    return priors, token_logps


def apply_naive_bayes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    priors: DataFrame,
    token_logps: DataFrame,
) -> DataFrame:
    """Argmax-posterior prediction: ``(id, pred, score_micro)`` — one
    row per input document, ``score_micro`` the winning class's
    log-posterior in micro units (BIGINT; exact, associative).

    Out-of-vocabulary tokens contribute nothing (both engines drop them
    via the same inner join — at scale this is the standard NB
    treatment, and it keeps the broadcast model ``V × C``); a document
    with no vocabulary tokens falls back to the class priors alone.
    Ties break (score DESC, label ASC) — deterministic everywhere.
    """
    # Degenerate-parallelism guard (r17): fan the projected rows out so
    # the scoring tokenize+explode runs wide on single-split scans; the
    # per-(doc, label) micro sums are exact BIGINTs.
    from .fanout import fan_out

    src = fan_out(df.select(id_col, text_col))
    doc_toks = src.select(
        F.col(id_col).alias("_id"), _tokens(src, text_col)
    ).where(F.col("token") != "")
    tok_scores = (
        doc_toks.join(
            F.broadcast(
                token_logps.select(
                    "token",
                    "label",
                    F.floor(F.col("logp6") * _M + F.lit(0.5)).alias("lp_micro"),
                )
            ),
            "token",
        )
        .groupBy("_id", "label")
        .agg(F.sum("lp_micro").alias("tok_micro"))
    )
    scored = (
        df.select(F.col(id_col).alias("_id"))
        .crossJoin(
            F.broadcast(
                priors.select(
                    "label",
                    F.floor(F.col("logprior6") * _M + F.lit(0.5)).alias(
                        "prior_micro"
                    ),
                )
            )
        )
        .join(tok_scores, ["_id", "label"], "left")
        .select(
            "_id",
            "label",
            (
                F.col("prior_micro")
                + F.coalesce(F.col("tok_micro"), F.lit(0))
            ).alias("score_micro"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_id").orderBy(
        F.col("score_micro").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred"),
            "score_micro",
        )
    )
