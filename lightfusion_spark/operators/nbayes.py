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
    # ONE validation/count job for the NULL guard, the doc total AND the
    # per-class doc counts (r18; r17 had merged guard+total, but the
    # class counts still re-scanned the corpus inside the priors and
    # dense-grid subtrees): a NULL label is just another group here, so
    # one groupBy(label) collect answers all three questions, and the
    # collected counts become a C-row local relation the priors/grid
    # expressions build from — the corpus never re-scans for class
    # stats.  The count table is one row per class, driver-bounded by
    # construction.
    class_rows = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col(text_col).isNull(), 1)), F.lit(0)
            ).alias("_bad_text"),
        )
        .collect()
    )
    n_total = sum(r["n_docs"] for r in class_rows)
    n_bad = sum(r["_bad_text"] for r in class_rows) + sum(
        r["n_docs"] for r in class_rows if r["label"] is None
    )
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
    classes = df.sparkSession.createDataFrame(
        [(r["label"], r["n_docs"]) for r in class_rows],
        schema=df.select(
            F.col(label_col).alias("label"),
            F.lit(0).cast("long").alias("n_docs"),
        ).schema,
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

    Out-of-vocabulary tokens contribute nothing (the standard NB
    treatment — the scorer simply skips tokens outside the ``V × C``
    model); a document with no vocabulary tokens falls back to the
    class priors alone.  Ties break (score DESC, label ASC) —
    deterministic everywhere.

    Shape (r18, guide §2.3/§4.2): tokenization stays JVM (the
    engine-identical lower/split contract) but emits the token ARRAY,
    and one ``mapInPandas`` scores whole batches against the
    sc.broadcast model — a vocab index lookup plus int64 segment adds,
    all exact integer arithmetic, so every (prediction, score_micro)
    is bit-identical to the join formulation it replaces
    (test-pinned).  The pre-r18 plan joined every token occurrence
    against the model (xC row amplification), shuffled the
    (doc, label) partial sums, and ranked them with a window — three
    exchanges that all disappear: scoring is now embarrassingly
    parallel, nothing shuffles at all.  The model crosses to the
    driver once (the old ``F.broadcast`` built the same driver-side
    relation) and ships to executors via ``sc.broadcast``.

    ``id_col`` is treated per ROW — the usual unique-key contract.
    (The old window formulation silently pooled tokens across
    duplicate-id rows and emitted one row; duplicate ids are a caller
    bug either way, and every registered face keys on a unique id.)
    """
    import numpy as np
    import pandas as pd

    # Degenerate-parallelism guard (r17): fan the projected rows out so
    # the scoring tokenize runs wide on single-split scans; scoring is
    # per-row, so partitioning cannot change a bit.
    from .fanout import fan_out

    spark = df.sparkSession
    # floor(x * 1e6 + 0.5) stays a JVM expression during the collect, so
    # the micro integers are the exact values the old join path summed
    prior_rows = priors.select(
        "label",
        F.floor(F.col("logprior6") * _M + F.lit(0.5))
        .cast("long")
        .alias("pm"),
    ).collect()
    labels = sorted(r["label"] for r in prior_rows)
    lab_idx = {lab: i for i, lab in enumerate(labels)}
    n_labels = len(labels)
    prior_vec = np.zeros(n_labels, dtype=np.int64)
    for r in prior_rows:
        prior_vec[lab_idx[r["label"]]] = r["pm"]
    model_rows = token_logps.select(
        "token",
        "label",
        F.floor(F.col("logp6") * _M + F.lit(0.5)).cast("long").alias("lp"),
    ).collect()
    vocab: dict = {}
    for r in model_rows:
        e = vocab.get(r["token"])
        if e is None:
            e = vocab[r["token"]] = np.zeros(n_labels, dtype=np.int64)
        e[lab_idx[r["label"]]] = r["lp"]
    tok_list = sorted(vocab)
    lp_mat = (
        np.stack([vocab[t] for t in tok_list])
        if tok_list
        else np.zeros((0, n_labels), dtype=np.int64)
    )
    bc = spark.sparkContext.broadcast(
        (tok_list, lp_mat, prior_vec, np.array(labels, dtype=object))
    )

    id_type = df.schema[id_col].dataType.simpleString()
    lab_type = priors.schema["label"].dataType.simpleString()
    schema = f"`{id_col}` {id_type}, pred {lab_type}, score_micro long"
    src = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("_tk"),
    )

    def score(batches):
        tok_list_w, lp_mat_w, prior_w, lab_arr = bc.value
        vindex = pd.Index(tok_list_w)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            toks = pdf["_tk"]
            lens = np.fromiter(
                ((len(t) if t is not None else 0) for t in toks),
                dtype=np.int64,
                count=n,
            )
            flat = [x for t in toks if t is not None for x in t]
            scores = np.tile(prior_w, (n, 1))
            if flat:
                idx = vindex.get_indexer(flat)
                row_idx = np.repeat(np.arange(n), lens)
                valid = idx >= 0
                np.add.at(scores, row_idx[valid], lp_mat_w[idx[valid]])
            # first maximum over asc-sorted labels == (score DESC,
            # label ASC) — the old window's tie-break
            best = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pred": lab_arr[best],
                    "score_micro": scores[np.arange(n), best],
                }
            )

    return src.mapInPandas(score, schema)
