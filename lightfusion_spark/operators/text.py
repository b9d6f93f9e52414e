"""Text-analysis operators for training-data pipelines (SURVEY §2.4).

Language ID, quality scoring, token counting, and document
fingerprinting — all as built-in-function DataFrame projections (no
Python in the hot path), each reproducible in ANSI SQL so the DuckDB
oracle can verify them value-for-value.

At 100 TB these are embarrassingly parallel single-pass projections:
no shuffle at all unless the caller aggregates afterwards.  The regex
work happens inside whole-stage codegen; for very hot paths the same
expressions compile to dictionary-encoded columnar ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-voting
#: language heuristic.  Deliberately small and alphabetical so the SQL
#: oracle can embed the identical literals.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["a", "and", "is", "of", "the"],
    "de": ["das", "der", "die", "ist", "und"],
    "fr": ["et", "la", "le", "les", "un"],
    "es": ["el", "los", "un", "una", "y"],
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(text_col), r"\s+")


def _stop_hits(toks: Column, words: list[str]) -> Column:
    """Occurrence count (with multiplicity) of tokens in a stopword list."""
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))


def text_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document quality features + a boolean keep/drop flag.

    Mirrors the usual pre-training quality filters: length bounds,
    word-length sanity, punctuation density, stopword density.
    ``passthrough_cols`` are copied onto the output unchanged, so
    composers (e.g. ``curation.quality_model_filter``) don't need a join
    back to (and a re-execution of) the input lineage.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    # sum of word lengths = chars minus separators; exact integer math
    avg_word_len = (
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words
    )
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9\\s]"), 0))
    stop_ratio = _stop_hits(toks, LANG_STOPWORDS["en"]) / n_words
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (passthrough_cols or [])],
        n_words.alias("n_words"),
        n_chars.alias("n_chars_fn"),
        avg_word_len.alias("avg_word_len"),
        (n_punct / n_chars).alias("punct_ratio"),
        stop_ratio.alias("en_stop_ratio"),
        (
            (n_words >= 10)
            & (avg_word_len >= 2)
            & (avg_word_len <= 12)
            & ((n_punct / n_chars) <= 0.2)
        ).alias("quality_keep"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-voting language heuristic.

    Counts per-language stopword hits and picks the max, ties broken in
    fixed (alphabetical-by-code: de, en, es, fr) preference order via
    strict-greater comparisons; zero hits everywhere -> 'und' (undetermined).
    """
    toks = _tokens(F.col(text_col))
    hits = {code: _stop_hits(toks, words) for code, words in LANG_STOPWORDS.items()}
    de, en, es, fr = hits["de"], hits["en"], hits["es"], hits["fr"]
    best = F.greatest(de, en, es, fr)
    pred = (
        F.when(best == 0, "und")
        .when(de == best, "de")
        .when(en == best, "en")
        .when(es == best, "es")
        .otherwise("fr")
    )
    return df.select(
        F.col(id_col),
        de.alias("hits_de"),
        en.alias("hits_en"),
        es.alias("hits_es"),
        fr.alias("hits_fr"),
        pred.alias("lang_pred"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pre-tokenizer count."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(t, r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)).alias("n_bpe_tokens"),
    )


#: PII patterns — restricted to syntax with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+[0-9]{7,15}"
URL_RE = "https?://[^\\s]+"
URL_DOMAIN_RE = "https?://([^/\\s]+)"
CCARD_RE = "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b"
SSN_RE = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
IBAN_RE = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

#: Full redaction chain, in application order (fixed so engines agree
#: when patterns could overlap: emails go before the URL catch-all so a
#: mailto-ish token is typed [EMAIL], card numbers before the bare-digit
#: phone/SSN shapes).  Each entry: (name, regex, replacement token) —
#: regexes stay in the Java∩RE2 common subset like the trio above.
REDACTION_CHAIN: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "[EMAIL]"),
    ("urls", URL_RE, "[URL]"),
    ("ips", IPV4_RE, "[IP]"),
    ("cards", CCARD_RE, "[CARD]"),
    ("ssns", SSN_RE, "[SSN]"),
    ("ibans", IBAN_RE, "[IBAN]"),
    ("phones", PHONE_RE, "[PHONE]"),
]


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition filters: top-word fraction and duplicate
    n-gram fractions (n=2,3), plus a keep flag at the published-ish
    thresholds.

    A document dominated by one word or by repeated n-grams is boilerplate
    or spam; pre-training corpora drop it.  Everything is per-row
    higher-order-function math — a narrow single-pass projection, no
    shuffle, embarrassingly parallel at 100 TB.

    Plan shape matters here: lambda HOFs evaluate outside whole-stage
    codegen, so a naive single projection re-evaluates ``split(lower(
    text))`` inside every lambda element access — O(n²) regex work per
    row.  We therefore *stage* the projection: tokens, then derived
    arrays, then stats.  Catalyst's CollapseProject keeps the stages
    separate (each alias is non-trivial and referenced more than once),
    so the token array materializes exactly once per row.  The top-word
    count is a sorted-run fold — O(n log n), not O(distinct · n).
    """
    # Degenerate-parallelism guard (r17): the per-row HOF folds are the
    # heavy map side — fan the projected rows out on single-split scans
    # (pure per-row projection; partitioning cannot change a row).
    from .fanout import fan_out

    step1 = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )

    t = F.col("__toks")
    nw = F.size(t)

    def grams(n: int) -> Column:
        # null (not []) when the doc is too short; the frac guard below
        # never looks at it in that case.
        return F.when(
            nw >= n,
            F.transform(
                F.sequence(F.lit(1), nw - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            ),
        )

    step2 = step1.select(
        F.col(id_col),
        nw.alias("n_words"),
        F.array_sort(t).alias("__sorted"),
        grams(2).alias("__g2"),
        grams(3).alias("__g3"),
    )

    # Max run length over the sorted tokens == count of the most frequent
    # token.  Single linear fold; `run` resets to 1 on every new token, so
    # the "" sentinel prev cannot inflate a count.
    srt = F.col("__sorted")
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step_fn(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(srt, zero, step_fn, lambda acc: acc["best"])

    def dup_frac(g: Column, n: int) -> Column:
        return F.when(F.col("n_words") < n, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(g)).cast("double") / F.size(g)
        )

    step3 = step2.select(
        F.col(id_col),
        F.col("n_words"),
        (top_count.cast("double") / F.col("n_words")).alias("top_word_frac"),
        dup_frac(F.col("__g2"), 2).alias("dup_2gram_frac"),
        dup_frac(F.col("__g3"), 3).alias("dup_3gram_frac"),
    )

    return step3.select(
        "*",
        (
            (F.col("top_word_frac") <= 0.2)
            & (F.col("dup_2gram_frac") <= 0.6)
            & (F.col("dup_3gram_frac") <= 0.5)
        ).alias("repetition_keep"),
    )


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrub: count + replace emails, IPv4 addresses and +intl phone
    numbers with typed placeholder tokens.

    Counting happens before redaction; replacement order (email -> ip ->
    phone) is fixed so the engines agree when patterns could overlap.
    Pure regex projection — single pass, no shuffle.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        clean.alias("text_clean"),
    )


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chain: list[tuple[str, str, str]] | None = None,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """Full-chain PII redaction — the curation sibling of
    :func:`pii_redact` (round-9 verdict item 6): every class in
    ``REDACTION_CHAIN`` (emails, URLs, IPv4, card numbers, SSNs, IBANs,
    intl phones) counted on the ORIGINAL text, then replaced
    sequentially in chain order with typed placeholder tokens.

    Emits ``(id, *passthrough, n_<class>..., n_redacted, text_redacted)``.
    Counts are per-class occurrences in the input text; ``n_redacted``
    is their sum (on overlapping matches an earlier replacement can
    consume a later class's span — the fixed chain order makes that
    deterministic, and counting on the original keeps the per-class
    numbers independent of it).

    Pure regex projection — single pass, JVM-side, no shuffle; at
    100 TB this runs at scan speed like every other text filter.
    """
    chain = chain if chain is not None else REDACTION_CHAIN
    # NULL text == empty text for the redaction contract: counts are 0
    # and text_redacted is '' — without the coalesce, size(extract_all)
    # yields -1 (legacy) / NULL (ANSI) and the output row is poisoned
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(rx), 0)).alias(f"n_{name}")
        for name, rx, _ in chain
    ]
    clean = t
    for _, rx, tok in chain:
        clean = F.regexp_replace(clean, rx, tok)
    total = None
    for name, _, _ in chain:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return df.select(
        F.col(id_col), *(passthrough_cols or []), *counts, clean.alias("text_redacted")
    ).withColumn("n_redacted", total)


def url_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """URL extraction: count, first domain (lowercased), distinct-domain
    count — the usual inputs to domain-blocklist filtering."""
    t = F.col(text_col)
    domains = F.transform(
        F.regexp_extract_all(t, F.lit(URL_DOMAIN_RE), 1), F.lower
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).alias("n_urls"),
        F.when(F.size(domains) > 0, F.element_at(domains, 1)).alias("first_domain"),
        F.size(F.array_distinct(domains)).alias("n_unique_domains"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint: md5 hex + a 56-bit integer bucket.

    Normalization: lowercase + whitespace runs collapsed to single
    spaces + trim.  The integer bucket is the first 14 hex digits —
    handy as a shuffle/partition key for distributed dedup.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp = F.md5(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 14), 16, 10).cast("bigint").alias("fp_bucket"),
    )


def unigram_lm_score(
    df: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained unigram LM.

    The CCNet-style LM quality filter, self-trained in one pass: the
    corpus's own token frequencies are the model, and each document is
    scored by the mean negative log-likelihood of its tokens::

        p(tok)  = (tf + k) / (N + k·V)        -- add-k smoothing
        avg_nll = mean(-ln p(tok) for tok in doc)

    Low scores = high-probability boilerplate; high scores = rare-token
    soup / gibberish.  Callers typically keep the middle band.
    Returns ``(id_col, n_toks, avg_nll)``.

    Scale (100 TB): three exchanges — the vocabulary aggregation
    (map-side combined: one row per distinct token), the token→model
    equi-join (AQE broadcasts when the vocabulary fits, shuffle-hash
    otherwise; natural-language vocabularies are Zipfian, so even a
    web-scale corpus keeps V ≪ N), and the per-document re-aggregation.
    The corpus-wide (N, V) scalars ride a broadcast one-row cross join,
    never a driver collect.  Per-token NLLs are rounded to 6 decimals
    and summed as DECIMAL so partial-aggregation order can't change a
    bit (ln differs in the last ulp across libm implementations).
    """
    # Degenerate-parallelism guard (r17): both corpus passes (vocab and
    # scoring) re-run tokenize+explode — fan the raw rows out so they
    # run wide on single-split scans (integer counts, DECIMAL sums).
    from .fanout import fan_out

    src = fan_out(df.select(id_col, text_col))
    toks = src.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    # The vocabulary is tiny (one row per distinct token) but feeds two
    # branches (the (N, V) scalars and the model); without a lineage cut
    # each branch would re-tokenize the full corpus — localCheckpoint
    # makes it one vocabulary pass + one scoring pass over the corpus.
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    stats = vocab.agg(
        F.sum("tf").alias("n_tok"), F.count(F.lit(1)).alias("n_vocab")
    )
    model = vocab.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.round(
            -F.log((F.col("tf") + F.lit(k)) / (F.col("n_tok") + F.lit(k) * F.col("n_vocab"))),
            6,
        ).alias("nll"),
    )
    return (
        toks.join(model, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (
                F.sum(F.col("nll").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )


def embed_text_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
) -> DataFrame:
    """Deterministic text -> dense vector via the hashing trick over
    TF-IDF weights — the dependency-free embedding operator that lets
    the ANN / semantic-dedup family compose from RAW TEXT instead of a
    precomputed embeddings table (round-7 item 6).

    Each token hashes to a bucket in ``[0, dim)`` with a ±1 sign bit
    (the signed feature-hashing construction of Weinberger et al.,
    "Feature Hashing for Large Scale Multitask Learning": the sign
    de-biases collisions, E[collision contribution] = 0)::

        bucket(t) = md5_56(t) mod dim
        sign(t)   = +1 / -1 from an independent md5 digit
        v[b]      = Σ_{t: bucket(t)=b} sign(t) · tf(doc,t) · idf(t)
        idf(t)    = round(ln((N+1)/(df+1)) + 1, 6)

    Returns ``(id_col, embedding array<double>)``.  Not L2-normalized:
    every downstream consumer here is cosine-based (scale-invariant),
    and skipping the normalize keeps components exact decimal sums —
    bit-reproducible in DuckDB, partial-aggregation-order-proof.

    This is NOT a semantic encoder — it is the classic sparse-retrieval
    projection (lexical overlap in ``dim`` dimensions).  Its job is to
    make text -> embed -> ANN/semdedup a runnable, verifiable pipeline;
    swap in a model encoder (Layer A inference UDF over a real encoder)
    for semantic similarity without touching anything downstream.

    Scale (100 TB): tf is one map-side-combinable groupBy over the
    exploded token stream; df/idf is a second small agg over tf's
    output (one row per distinct (doc, token), never re-scanning the
    corpus); the scoring join is tf⋈idf on token (Zipf-bounded model
    side, AQE-broadcast); bucket assembly is one groupBy(id) building a
    ``map_from_entries`` -> dense array projection — no dim×docs
    explosion, no Python, no driver state.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    # Degenerate-parallelism guard (r17): fan the raw rows out so the
    # tokenize+explode (the corpus-heavy map side of tf) runs wide
    # instead of in one task on single-split scans.  tf/df are exact
    # integer counts — partitioning cannot change a component.
    from .fanout import fan_out

    src = fan_out(df.select(id_col, text_col))
    toks = src.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 14), 16, 10).cast("bigint")
    sign_digit = F.conv(F.substring(F.md5(F.col("tok")), 15, 1), 16, 10).cast("int")
    idf = F.round(
        F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)))
        + F.lit(1.0),
        6,
    ).cast("decimal(18,6)")
    model = dfreq.crossJoin(F.broadcast(ndocs)).select(
        "tok",
        (h % F.lit(dim)).alias("bucket"),
        F.when(sign_digit % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sign"),
        idf.alias("idf"),
    )
    contrib = (
        tf.join(model, "tok")
        .groupBy(id_col, "bucket")
        .agg(
            F.sum(F.col("sign") * F.col("tf") * F.col("idf"))
            .cast("double")
            .alias("val")
        )
    )
    dense = F.expr(
        "transform(sequence(0, {d}), i -> "
        "coalesce(element_at(_m, i), cast(0.0 as double)))".format(d=dim - 1)
    )
    emb = (
        contrib.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("val")))
            ).alias("_m")
        )
        .select(F.col(id_col), dense.alias("embedding"))
    )
    # every input row gets a vector, even empty/null text (all-zero)
    zeros = F.expr(f"transform(sequence(0, {dim - 1}), i -> cast(0.0 as double))")
    return (
        df.select(F.col(id_col))
        .join(emb, id_col, "left")
        .select(F.col(id_col), F.coalesce("embedding", zeros).alias("embedding"))
    )


#: BOS sentinel for n-gram contexts — a control char no whitespace-split
#: token can contain (DuckDB spells it chr(2)).
_BOS = "\x02"


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 0.5,
    lambdas: tuple[float, float, float] = (0.2, 0.3, 0.5),
) -> DataFrame:
    """Per-document cross-entropy under an interpolated trigram LM —
    the higher-order upgrade of :func:`unigram_lm_score` (the CCNet
    recipe both cite uses a 5-gram KenLM; unigram perplexity misranks
    fluent-but-rare text because it ignores word ORDER entirely).

    Each document is BOS-padded (two ``\\x02`` sentinels) and every real
    token scored by the Jelinek-Mercer interpolation::

        p(w | h) = λ1·p1(w) + λ2·p2(w|w-1) + λ3·p3(w|w-2,w-1)
        pn(w|ctx) = (c(ctx,w) + k) / (c(ctx) + k·V)     -- add-k per order
        avg_nll   = mean(-ln p(w|h))

    trained on the scored corpus itself, one pass.  Word salad that
    sails through a unigram model (common words, shuffled) now pays for
    its improbable transitions.  Returns ``(id_col, n_toks, avg_nll)``.

    Scale (100 TB): the (token, ctx1, ctx2) stream is a zero-shuffle
    projection + posexplode recomputed per consumer (recompute beats
    pinning a corpus-sized relation in executor storage — the
    span-dedup lesson); the three count tables shuffle map-side-combined
    and are Zipf-bounded (distinct n-grams ≪ token stream for natural
    language), so the five scoring joins AQE-broadcast when they fit
    and shuffle-hash otherwise.  Context totals derive from the
    already-aggregated pair counts, not a second corpus pass.  Per-token
    NLLs round to 6 decimals and sum as DECIMAL — partial-aggregation
    order can never change a bit.
    """
    l1, l2, l3 = (float(x) for x in lambdas)
    toks = _tokens(F.col(text_col))
    # one row per real token: (id, w, ctx1, ctx2) — contexts from the
    # BOS-padded array; token arrays are materialized as a projection
    # before the lambda references them (the doc_shingles trick).
    # Degenerate-parallelism guard (r17): emit is recomputed by FOUR
    # consumers (three count tables + the scoring join) and each pass
    # re-runs tokenize+posexplode — fan the raw rows out so all four
    # run wide instead of in one task on single-split scans (all
    # downstream sums are exact integers/DECIMAL).
    from .fanout import fan_out

    padded = F.concat(F.array(F.lit(_BOS), F.lit(_BOS)), toks)
    emit = (
        fan_out(df.select(id_col, text_col))
        .select(F.col(id_col), padded.alias("_pt"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    "transform(slice(_pt, 3, greatest(size(_pt) - 2, 0)), "
                    "(x, i) -> named_struct("
                    "'w', x, "
                    "'ctx1', _pt[i + 1], "
                    "'ctx2', concat_ws(' ', _pt[i], _pt[i + 1])))"
                )
            ).alias("_pos", "_g"),
        )
        .select(
            F.col(id_col),
            F.col("_g.w").alias("w"),
            F.col("_g.ctx1").alias("ctx1"),
            F.col("_g.ctx2").alias("ctx2"),
        )
    )
    uni = emit.groupBy("w").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(
        eager=False
    )
    stats = uni.agg(F.sum("tf").alias("n_tok"), F.count(F.lit(1)).alias("n_vocab"))
    big = (
        emit.groupBy("ctx1", "w")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=False)
    )
    cbig = big.groupBy("ctx1").agg(F.sum("c2").alias("cc1"))
    tri = (
        emit.groupBy("ctx2", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
        .localCheckpoint(eager=False)
    )
    ctri = tri.groupBy("ctx2").agg(F.sum("c3").alias("cc2"))
    kv = F.lit(k) * F.col("n_vocab")
    p1 = (F.col("tf") + F.lit(k)) / (F.col("n_tok") + kv)
    p2 = (F.coalesce("c2", F.lit(0)) + F.lit(k)) / (F.coalesce("cc1", F.lit(0)) + kv)
    p3 = (F.coalesce("c3", F.lit(0)) + F.lit(k)) / (F.coalesce("cc2", F.lit(0)) + kv)
    nll = F.round(-F.log(F.lit(l1) * p1 + F.lit(l2) * p2 + F.lit(l3) * p3), 6)
    return (
        emit.join(uni, "w")
        .join(big, ["ctx1", "w"], "left")
        .join(cbig, "ctx1", "left")
        .join(tri, ["ctx2", "w"], "left")
        .join(ctri, "ctx2", "left")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), nll.alias("_nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (
                F.sum(F.col("_nll").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms —
    the classic retrieval/quality-ranking primitive (targeted corpus
    selection: "find the docs most about X" at pre-training scale).

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)      [RSJ+1, ≥ 0]

    Returns ``(id_col, n_toks, bm25)`` for EVERY document (0.0 when no
    term matches).

    Scale (100 TB): the exploded token stream is filtered to the query
    term set *before* any shuffle (an isin over a literal array — pushes
    into the scan projection), so the wide intermediate is |matches|,
    not |tokens|.  Three exchanges on top of it: per-(doc, term) tf,
    per-term document frequency (≤ |terms| rows, broadcast back), and
    the final per-doc sum.  The corpus scalars (N, avgdl) ride a
    broadcast one-row cross join, never a driver collect.  Per-term
    scores round to 6 decimals and sum as DECIMAL so partial-aggregation
    order can't change a bit (ln differs in the last ulp across libm
    implementations).

    Fault tolerance / storage: only the tiny ``(id, dl)`` frame is
    localCheckpoint-pinned (it feeds the corpus stats AND the final
    every-document left join — ~16 bytes/row, not the |tokens|-sized
    arrays).  The matches branch re-tokenizes from the raw text instead:
    its explode is filtered to the term set in the same stage, so the
    retokenize trades bounded CPU for not parking a token-array copy of
    the corpus in executor block storage (and for lineage that can
    recompute the wide branch after an executor loss).
    """
    tok_expr = _tokens(F.col(text_col))
    # Degenerate-parallelism guard (r17): both tokenize passes (doc
    # lengths + the match explode) run wide on single-split scans;
    # integer tf counts and micro-long sums are partitioning-proof.
    from .fanout import fan_out

    base = fan_out(df.select(F.col(id_col), F.col(text_col)))
    d = base.select(
        F.col(id_col), F.size(tok_expr).alias("dl")
    ).localCheckpoint(eager=False)  # (id, dl) only — tiny, feeds 2 branches

    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    matches = (
        base.select(
            F.col(id_col), F.size(tok_expr).alias("dl"), F.explode(tok_expr).alias("tok")
        )
        .where(F.col("tok").isin(query_terms))
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_score_matches(d, matches, stats, id_col, k1, b)


def bm25_scores_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: DataFrame,
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``bm25_scores`` with the query terms supplied as a DataFrame — the
    retrieval-style surface: score the corpus against a (small) term table
    without rebuilding the plan per query set.

    Identical math and output schema to :func:`bm25_scores`; the only
    difference is where the term set lives.  The literal-list variant
    prunes the exploded token stream with an ``isin`` over a constant
    array (foldable into the stage); here the prune is a **broadcast
    LEFT SEMI join** against the distinct term table — the term set never
    touches the driver as Python values, so it can come straight from
    another query's output (top-k terms, a decontamination list, …) and
    can be thousands of terms without blowing up the plan string.  The
    wide intermediate stays |matches|, not |tokens|, and everything after
    the semi join is the same three bounded exchanges.
    """
    tok_expr = _tokens(F.col(text_col))
    # Degenerate-parallelism guard (r17): both tokenize passes (doc
    # lengths + the match explode) run wide on single-split scans;
    # integer tf counts and micro-long sums are partitioning-proof.
    from .fanout import fan_out

    base = fan_out(df.select(F.col(id_col), F.col(text_col)))
    d = base.select(
        F.col(id_col), F.size(tok_expr).alias("dl")
    ).localCheckpoint(eager=False)  # (id, dl) only — tiny, feeds 2 branches

    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    term_set = terms.select(F.col(term_col).alias("tok")).distinct()
    matches = (
        base.select(
            F.col(id_col), F.size(tok_expr).alias("dl"), F.explode(tok_expr).alias("tok")
        )
        .join(F.broadcast(term_set), "tok", "leftsemi")
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_score_matches(d, matches, stats, id_col, k1, b)


def _bm25_score_matches(
    d: DataFrame,
    matches: DataFrame,
    stats: DataFrame,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 tail: per-term scoring over the pruned ``(id, dl, tok,
    tf)`` matches, then the every-document left join (docs with no match
    score 0.0).  ``d`` is the checkpointed ``(id, dl)`` frame; ``stats``
    the one-row ``(n_docs, avgdl)`` aggregate.

    ``matches`` is pinned here because BOTH dfreq and the scoring
    projection consume it — without the pin each consumer re-ran the
    corpus tokenize + explode + term prune + tf shuffle.  The relation
    is |matching (doc, term)| rows, bounded by the query-term set."""
    from .fanout import pin

    matches = pin(matches)
    dfreq = matches.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    # per-term scores quantize to integer micro-units via FLOOR(x*1e6+0.5)
    # — explicit IEEE arithmetic identical across engines, where engine
    # ROUND() implementations diverge near decimal midpoints (the
    # pipe_lm_buckets sf0.1 lesson); the per-doc sum is then exact longs.
    scored = (
        matches.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("dfreq") + 0.5)
                    / (F.col("dfreq") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * 1e6
                + F.lit(0.5)
            ).alias("_s_micro"),
        )
        .groupBy(id_col)
        .agg(F.sum("_s_micro").alias("_bm25_micro"))
    )
    return (
        d.select(F.col(id_col), F.col("dl").alias("n_toks"))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            "n_toks",
            (
                F.coalesce("_bm25_micro", F.lit(0)).cast("double") / F.lit(1e6)
            ).alias("bm25"),
        )
    )


def _literal_regex(sep: str) -> str:
    r"""Quote a literal separator for Java-regex ``F.split`` (``\Q…\E``),
    so ``sep="|"`` splits on pipes — matching the literal semantics of
    the ``array_join`` rebuild and the DuckDB ``string_split`` oracle."""
    if "\\E" in sep:
        raise ValueError(r"separator may not contain the \E regex terminator")
    return "\\Q" + sep + "\\E"


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_frac: float = 0.05,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style boilerplate detection: the distinct lines appearing in
    at least ``min_doc_frac`` of all documents (navigation chrome, cookie
    banners, license footers — the lines a crawl repeats everywhere).

    Returns ``(line, n_docs, doc_frac)``.  Empty lines are ignored.

    Scale (100 TB): one explode → per-(doc, line) distinct → one count
    per distinct line (map-side combinable; Zipf keeps the distinct-line
    relation far below the token stream).  The corpus size rides a
    broadcast one-row cross join.  The report is small BY CONSTRUCTION:
    at most ``1/min_doc_frac`` lines can exceed the threshold per
    average document line count, which is what lets
    :func:`strip_boilerplate` broadcast it back against the corpus.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), _literal_regex(sep))).alias("line"),
    ).where(F.length("line") > 0)
    per_doc = lines.distinct()
    total = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    return (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "line",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("_n_docs")).alias("doc_frac"),
        )
        .where(F.col("doc_frac") >= min_doc_frac)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_frac: float = 0.05,
    sep: str = "\n",
) -> DataFrame:
    """Remove boilerplate lines (per :func:`boilerplate_lines`) from every
    document and rebuild the text in original line order.

    Returns ``(id_col, clean_text, n_lines, n_removed)`` for EVERY
    document — ``clean_text`` is ``""`` when all lines were boilerplate;
    empty lines are dropped from both the rebuild and the counts.

    Scale: the boilerplate set is bounded (see :func:`boilerplate_lines`)
    and broadcast-marked onto the exploded lines with one LEFT join —
    the line stream itself never shuffle-joins, and the pre-strip line
    count, kept count, and ordered rebuild all come out of a SINGLE
    per-document aggregation over that one explode (``collect_list`` of
    (pos, line) structs for non-boilerplate lines, ``array_sort`` —
    pos is unique per doc, so the order is total and
    partitioning-independent).  Two corpus scans total: the detection
    aggregate and this one.
    """
    bp = boilerplate_lines(df, id_col, text_col, min_doc_frac, sep).select(
        "line", F.lit(True).alias("_bp")
    )
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _literal_regex(sep))).alias(
            "pos", "line"
        ),
    ).where(F.length("line") > 0)
    keep = F.col("_bp").isNull()
    per_doc = (
        lines.join(F.broadcast(bp), "line", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(keep, 1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "line")))
                    ),
                    lambda x: x["line"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (
                F.coalesce("n_lines", F.lit(0)) - F.coalesce("_n_kept", F.lit(0))
            ).alias("n_removed"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """Split every document into fixed-token-count chunks with overlap —
    the standard pretraining/RAG windowing step (long docs become
    model-sized pieces; the overlap preserves cross-boundary context).

    Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride +
    chunk_tokens)`` with ``stride = chunk_tokens - overlap``; windows
    advance until one reaches the document end (the HuggingFace
    ``return_overflowing_tokens`` rule), so every chunk except the last
    is exactly ``chunk_tokens`` long, every token belongs to >= 1 chunk,
    and no chunk is fully contained in its predecessor.  Returns
    ``(id_col, *passthrough_cols, chunk_id, n_chunk_tokens,
    chunk_text)`` — ``passthrough_cols`` are per-document metadata
    copied onto every chunk row, so downstream aggregations don't have
    to join back to (and re-execute) the document lineage.

    Scale (100 TB): a pure projection + explode — zero shuffles, no
    Python, output rows ≈ n_tokens/stride per doc.  Token slicing is
    `slice` over the split array inside whole-stage codegen; emitting
    chunk TEXT multiplies bytes by ~(1 + overlap/stride), which is the
    operator's semantics — follow with pack_sequences/shard_assign for
    the write side.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    last_chunk = (
        F.when(n <= chunk_tokens, F.lit(0))
        .otherwise(F.ceil((n - chunk_tokens) / stride))
        .cast("int")
    )
    chunk_ids = F.sequence(F.lit(0), last_chunk)
    extra = list(passthrough_cols or [])
    exploded = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        toks.alias("_toks"),
        n.alias("_n"),
        F.explode(chunk_ids).alias("chunk_id"),
    )
    sliced = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        F.col(id_col),
        *extra,
        "chunk_id",
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("chunk_id") * stride
        ).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


def split_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rule-based sentence segmentation: one row per sentence,
    ``(id, sent_idx, sentence)`` — the unit RAG chunkers and quality
    scorers actually want (fixed-token windows cut mid-thought;
    sentence boundaries don't).

    Boundary rule: split after ``.!?`` (plus closing quotes/brackets)
    followed by whitespace and an upper-case/digit/quote opener — a
    Java-regex lookbehind/lookahead pair, pure JVM ``split`` +
    ``posexplode``, zero shuffle.  Deliberately rule-based: the
    abbreviation-aware models are a library seam; this rule is the
    deterministic, language-limited (Latin-script) baseline and says
    so.  Empty/whitespace-only sentences are dropped.
    """
    boundary = r"""(?<=[.!?][\)\]"']?)\s+(?=["'\(\[]?[A-Z0-9])"""
    sents = F.split(F.col(text_col), boundary)
    return (
        df.select(F.col(id_col), F.posexplode(sents).alias("sent_idx", "sentence"))
        .withColumn("sentence", F.trim(F.col("sentence")))
        .where(F.length(F.col("sentence")) > 0)
    )


def chunk_by_sentences(
    df: DataFrame, id_col: str, text_col: str, max_chars: int = 512
) -> DataFrame:
    """Sentence-aware chunking: consecutive sentences grouped into
    chunks of ~``max_chars``, never splitting inside a sentence —
    ``(id, chunk_idx, chunk_text, n_sents, n_chars)``.

    Assignment rule: a sentence joins chunk ``floor(chars_before /
    max_chars)`` (cumulative length over a per-doc window).  This is
    the DISTRIBUTABLE approximation of greedy packing — greedy's
    running-total-with-reset is inherently sequential per doc — and
    differs from it only in allowing a chunk to overflow by less than
    one sentence; stated here because both definitions are common.
    One per-doc window + one groupBy, both on the doc key.

    ``chunk_text`` rebuilds the sentences in ``sent_idx`` order via
    ``sort_array(collect_list(struct(sent_idx, sentence)))`` —
    ``collect_list`` alone has NO order guarantee under real
    multi-partition execution (it happened to look ordered on local
    runs), so without the sort the chunk text was nondeterministic at
    scale; the struct sort pins it for any partitioning.
    """
    from pyspark.sql.window import Window

    sents = split_sentences(df, id_col, text_col)
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chars_before = F.coalesce(
        F.sum(F.length(F.col("sentence")) + 1).over(w), F.lit(0)
    )
    tagged = sents.withColumn(
        "chunk_idx", F.floor(chars_before / F.lit(max_chars)).cast("int")
    )
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("sent_idx"), F.col("sentence")))
    )
    return tagged.groupBy(id_col, "chunk_idx").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["sentence"]), " "
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("n_sents"),
        F.sum(F.length("sentence")).alias("n_chars"),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str,
    form: str = "NFC",
    strip_controls: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Unicode normalization — the ingestion step exact dedup silently
    depends on: ``é`` as U+00E9 and as ``e``+U+0301 are the same text
    but different bytes, so unnormalized corpora under-merge.

    ``form`` is NFC (canonical, the dedup default) or NFKC (also folds
    compatibility characters — ligatures, full-width forms; lossier,
    right before tokenization).  ``strip_controls`` removes C0/C1
    controls except tab/newline (crawl payloads carry NUL and friends
    that break downstream tools).  Arrow-batched ``mapInPandas`` over
    stdlib ``unicodedata`` — normalization tables are a data problem,
    not logic; no JVM builtin exists and a row-at-a-time UDF would be
    the slow path.
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize_unicode: unknown form {form!r}")
    out = out_col or text_col
    cols = df.columns
    out_cols = cols if out in cols else [*cols, out]
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" if c in df.columns else f"`{c}` string"
        for c in out_cols
    )
    _CTRL = dict.fromkeys(
        c for c in list(range(0x00, 0x20)) + list(range(0x7F, 0xA0))
        if c not in (0x09, 0x0A)
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def norm(t):
                if t is None:
                    return None
                t = unicodedata.normalize(form, t)
                return t.translate(_CTRL) if strip_controls else t

            pdf = pdf.copy()
            pdf[out] = pdf[text_col].map(norm)
            yield pdf[out_cols]

    return df.mapInPandas(work, schema)


def top_terms_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest-TF-IDF terms,
    deterministically tie-broken — the classic corpus-statistics
    summarizer (and the per-doc dual of :func:`embed_text_tfidf`, which
    folds the same weights into a dense vector instead of ranking them).

    Returns ``(id_col, rank, term, score)`` with
    ``score = round(tf * idf, 6)`` and ``idf = round(ln((N+1)/(df+1))
    + 1, 6)`` (the same smoothed idf as the embedding operator, exact
    DECIMAL-free per-row arithmetic so DuckDB replays it bit-for-bit).
    Ties order by (score desc, term asc).

    Scale (100 TB): tf is one map-side-combinable groupBy over the
    exploded token stream; df is a second agg over tf's distinct
    (doc, term) output; the idf join-back is Zipf-bounded and
    AQE-broadcast; the top-k is one per-doc ROW_NUMBER window — the
    corpus shuffles once on (doc, term) and once on doc.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)))
        + F.lit(1.0),
        6,
    )
    scored = (
        tf.join(F.broadcast(dfreq.crossJoin(F.broadcast(ndocs))), "term")
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("tf") * idf, 6).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "rank", "term", "score")
    )


def bm25_scores_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: DataFrame,
    query_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 for MANY queries at once: ``query_terms`` is a
    ``(query_col, term_col)`` relation and the output is
    ``(query_col, id_col, bm25)`` — one score per (query, matching
    document).  The retrieval building block :mod:`.retrieval` fuses
    with the vector side.

    Identical math to :func:`bm25_scores` per query, computed the
    multi-query-efficient way: per-(doc, term) scores are derived ONCE
    over the UNION of all queries' terms (idf/dfreq are corpus
    properties, independent of which query asked), then the broadcast
    ``query_terms`` join fans each scored term out to its querying
    queries and the per-(query, doc) sum aggregates exact micro-int
    longs.  Non-matching (query, doc) pairs are ABSENT (retrieval
    semantics), unlike the every-doc-with-0.0 single-query surface.

    Scale (100 TB): everything the single-query operator does once —
    the token-stream semi-join prune, the three bounded exchanges —
    plus one broadcast fan-out join; cost grows with |distinct terms|
    and |matches|, not with |queries| × |corpus|.
    """
    tok_expr = _tokens(F.col(text_col))
    qt = query_terms.select(
        F.col(query_col).alias("_qid"), F.col(term_col).alias("tok")
    ).distinct()
    term_set = qt.select("tok").distinct()
    # Degenerate-parallelism guard (r17): both tokenize passes run wide
    # on single-split scans (integer counts, micro-long sums).
    from .fanout import fan_out

    base = fan_out(df.select(F.col(id_col), F.col(text_col)))
    d = base.select(F.col(id_col), F.size(tok_expr).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # Pin the per-(doc, term) matches: BOTH dfreq and the scoring
    # projection consume them, and without the pin each consumer
    # re-ran the corpus tokenize + explode + semi-join + tf shuffle.
    # The relation is |matching (doc, term)| rows — bounded by the
    # query-term union, never |tokens| — so the stored bytes are the
    # same size class as the tf exchange that produced them.
    from .fanout import pin

    matches = pin(
        base.select(
            F.col(id_col),
            F.size(tok_expr).alias("dl"),
            F.explode(tok_expr).alias("tok"),
        )
        .join(F.broadcast(term_set), "tok", "leftsemi")
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = matches.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    scored = (
        matches.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "tok",
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("dfreq") + 0.5)
                    / (F.col("dfreq") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * 1e6
                + F.lit(0.5)
            ).alias("_s_micro"),
        )
    )
    return (
        scored.join(F.broadcast(qt), "tok")
        .groupBy(F.col("_qid").alias(query_col), id_col)
        .agg(
            (F.sum("_s_micro").cast("double") / F.lit(1e6)).alias("bm25")
        )
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the information-density
    quality signal beside :func:`repetition_stats`' duplicate-fraction
    view: low entropy flags keyword-stuffed / template / boilerplate
    documents whose token histogram is concentrated (repetition_stats
    sees ADJACENT repeats; entropy sees GLOBAL concentration, e.g. the
    same 5 tokens shuffled through 1000 positions).

    Emits one row per document with >= 1 whitespace token (empty/NULL
    documents carry no distribution — filter or default upstream):

    * ``n_tokens`` / ``n_types`` — token count and distinct-type count;
    * ``entropy_e6`` — ``H = -Σ p·ln p`` in exact micro-nats: each
      type's term is ``FLOOR((c/n) · (-ROUND(LN(c/n), 6)) · 1e6 + 0.5)``
      (IEEE-identical per-row doubles, 6-decimal-rounded transcendental),
      then an associative BIGINT sum — partition order can never flip a
      bit, and the DuckDB oracle replays it literally;
    * ``norm_entropy6`` — ``H / ln(n_types)`` rounded to 6 decimals and
      clamped to 1.0 (the floored term sum can overshoot ``ln(n)·1e6``
      by a few micro-nats on uniform docs; the ``LEAST`` keeps the 0..1
      contract literal — r11 verdict nit; 0.0 by convention for
      single-type documents).

    Scale (100 TB): one explode over the token stream, one map-side-
    combinable (doc, token) count, one map-side-combinable per-doc fold
    — no joins, no windows; the token stream is never a shuffle-join
    side.  Zipf does not bound the per-doc state here because the key
    is (doc, token) — the shuffle carries the per-document TYPE
    histogram, ~n_types rows per doc, the same relation BM25 shuffles.
    """
    # Degenerate-parallelism guard (r17): tokenize+explode is the heavy
    # map-side pass (the partial (doc, token) aggregation runs on the
    # exploded stream); fan the raw rows out so it runs wide instead of
    # in one task on single-split scans.  All downstream sums are exact
    # integers — partitioning cannot flip a bit.
    from .fanout import fan_out

    src = fan_out(df.select(id_col, text_col))
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    cells = (
        src.select(
            F.col(id_col),
            F.size(toks).alias("_n"),
            F.explode(toks).alias("_tok"),
        )
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"), F.max("_n").alias("_nt"))
    )
    p = F.col("_c").cast("double") / F.col("_nt").cast("double")
    term = F.floor(p * (-F.round(F.log(p), 6)) * F.lit(1e6) + F.lit(0.5)).cast(
        "bigint"
    )
    per_doc = cells.groupBy(id_col).agg(
        F.max("_nt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(term).alias("entropy_e6"),
    )
    h = F.col("entropy_e6").cast("double") / F.lit(1e6)
    norm = F.when(
        F.col("n_types") > 1,
        F.least(
            F.lit(1.0),
            F.round(h / F.round(F.log(F.col("n_types").cast("double")), 6), 6),
        ),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        "n_types",
        "entropy_e6",
        norm.alias("norm_entropy6"),
    )


_EOS = "\x03"


def kn_bigram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document log-probability under an interpolated Kneser-Ney
    bigram LM trained on the scored corpus itself — the smoothing that
    beats Jelinek-Mercer/add-k (:func:`ngram_lm_score`) because its
    backoff weighs a word by how many DISTINCT contexts it follows
    (continuation probability), not raw frequency: "francisco" is
    frequent but occurs after almost nothing except "san", so KN
    correctly refuses to predict it in fresh contexts where a
    frequency backoff would.

    Every document is wrapped ``BOS … EOS`` (``\\x02``/``\\x03``
    sentinels, same convention as :func:`ngram_lm_score`), so even an
    empty document scores one (BOS, EOS) bigram.  With ``D`` the
    absolute discount, ``c`` the corpus bigram count, ``ctot = c(w1·)``,
    ``nfollow = N1+(w1·)``, ``nprec = N1+(·w2)``, ``T`` = distinct
    bigram types::

        P(w2|w1) = (c - D)/ctot + ((D·nfollow)/ctot) · (nprec/T)

    (the ``max(c-D, 0)`` clip is vacuous when scoring the training
    corpus: every scored bigram has ``c >= 1 > D``).  Per-type
    ``ln P`` is rounded to 6 decimals and folded as
    ``FLOOR(·*1e6+0.5)`` micro-nats; per-document sums weight each
    type by its in-document multiplicity — pure BIGINT arithmetic, so
    the result is partition-invariant and oracle-replayable bit for
    bit.  Returns ``(id_col, n_bigrams, logprob_micro, avg_logprob,
    ppl6)`` where ``avg_logprob`` is one exact IEEE division and
    ``ppl6 = ROUND(EXP(-avg_logprob), 6)``.

    Scale (100 TB): the bigram stream is a zero-shuffle projection +
    posexplode; FOUR count tables derive from the single (w1, w2)
    aggregation (never a second corpus pass) and are Zipf-bounded
    (distinct bigrams ≪ token stream), so the scoring joins
    AQE-broadcast when the model fits and shuffle-hash otherwise; the
    per-document fold joins the doc-level (id, w1, w2, multiplicity)
    relation — one row per distinct bigram per doc — against the
    model, not the raw token stream.
    """
    d = float(discount)
    if not (0.0 < d < 1.0):
        raise ValueError(f"kn_bigram_lm_score: discount must be in (0,1), got {discount}")
    # NULL text scores as the empty document (one BOS->EOS bigram) —
    # without the coalesce the padded array is NULL and the document
    # silently vanishes from both the model AND the output; the empty
    # filter drops split('')'s [''] artifact so empty == NULL == no
    # real tokens
    toks = F.filter(
        _tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda x: x != F.lit(""),
    )
    padded = F.concat(
        F.array(F.lit(_BOS)), toks, F.array(F.lit(_EOS))
    )
    # Degenerate-parallelism guard (r17): fan the raw rows out so the
    # tokenize+posexplode runs wide on single-split scans (exact
    # integer counts downstream).
    from .fanout import fan_out

    emit = (
        fan_out(df.select(id_col, text_col))
        .select(F.col(id_col), padded.alias("_pt"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    # slice position 2 (1-based) = bracket index 1
                    # (0-based): x = _pt[i + 1], so its predecessor is
                    # _pt[i]
                    "transform(slice(_pt, 2, greatest(size(_pt) - 1, 0)), "
                    "(x, i) -> named_struct('w1', _pt[i], 'w2', x))"
                )
            ).alias("_pos", "_g"),
        )
        .select(
            F.col(id_col),
            F.col("_g.w1").alias("w1"),
            F.col("_g.w2").alias("w2"),
        )
    )
    # one row per distinct bigram per document, with multiplicity —
    # the corpus model derives from THIS relation (no second pass)
    db = emit.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("k_occ")
    ).localCheckpoint(eager=False)
    bc = db.groupBy("w1", "w2").agg(F.sum("k_occ").alias("c")).localCheckpoint(
        eager=False
    )
    ctx = bc.groupBy("w1").agg(F.sum("c").alias("ctot"))
    n1f = bc.groupBy("w1").agg(F.count(F.lit(1)).alias("nfollow"))
    ncont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("nprec"))
    tt = bc.agg(F.count(F.lit(1)).alias("n_types"))
    p = (
        (F.col("c").cast("double") - F.lit(d)) / F.col("ctot").cast("double")
    ) + (
        (F.lit(d) * F.col("nfollow").cast("double"))
        / F.col("ctot").cast("double")
    ) * (F.col("nprec").cast("double") / F.col("n_types").cast("double"))
    model = (
        bc.join(ctx, "w1")
        .join(n1f, "w1")
        .join(ncont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.floor(F.round(F.log(p), 6) * F.lit(1000000) + F.lit(0.5))
            .cast("long")
            .alias("lnp_micro"),
        )
    )
    return (
        db.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("k_occ").alias("n_bigrams"),
            F.sum(F.col("k_occ") * F.col("lnp_micro")).alias("logprob_micro"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "logprob_micro",
            (
                F.col("logprob_micro").cast("double")
                / (F.col("n_bigrams") * F.lit(1000000)).cast("double")
            ).alias("avg_logprob"),
            F.round(
                F.exp(
                    -(
                        F.col("logprob_micro").cast("double")
                        / (F.col("n_bigrams") * F.lit(1000000)).cast("double")
                    )
                ),
                6,
            ).alias("ppl6"),
        )
    )


def kn_trigram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document log-probability under an interpolated Kneser-Ney
    TRIGRAM LM trained on the scored corpus — the full KenLM-shaped
    recursion over :func:`kn_bigram_lm_score`: the middle and bottom
    orders use CONTINUATION counts derived from the trigram type table
    (how many distinct left contexts a suffix appears in), exactly the
    count-of-counts discipline that makes KN the standard pretraining
    quality model.

    Documents are wrapped ``BOS BOS … EOS``; every real token and the
    EOS is scored with its full two-word history.  With ``D`` the
    absolute discount and all statistics derived from ONE corpus
    trigram aggregation (types with multiplicities):

    * top (raw counts): ``c3(w1w2w3)``, ``ctx3(w1w2·)``,
      ``nf3 = N1+(w1w2·)``
    * middle (continuation): ``cont2(w2w3) = N1+(·w2w3)``,
      ``mid2(w2) = N1+(·w2·)``, ``nfc(w2)`` = distinct suffix types
      after ``w2``
    * bottom: ``npre2(w3) = N1+(·`·`w3)`` distinct middles preceding
      ``w3``, ``T2c`` = total distinct suffix types

    and the probability is the fixed-order IEEE expression::

        P2c = (cont2 - D)/mid2 + ((D*nfc)/mid2) * (npre2/T2c)
        P3  = (c3 - D)/ctx3   + ((D*nf3)/ctx3)  * P2c

    which sums to exactly 1 over the vocabulary per history (the KN
    telescoping identity — asserted by test).  Per-type ``ln P3``
    rounds to 6 decimals and folds as multiplicity-weighted BIGINT
    micro-nats, so the result is partition-invariant bit for bit and
    the whole train-then-score loop replays in one SQL oracle.
    Returns ``(id_col, n_trigrams, logprob_micro, avg_logprob,
    ppl6)``.

    Scale (100 TB): one posexplode of the padded token stream; the
    per-document distinct-trigram relation feeds BOTH the corpus
    model (five Zipf-bounded aggregations, all derived from the one
    (w1,w2,w3) aggregate — never a second corpus pass) and the
    scoring join; the model join AQE-broadcasts when it fits.  No
    windows, no driver loops, no Python crossings.
    """
    d = float(discount)
    if not (0.0 < d < 1.0):
        raise ValueError(
            f"kn_trigram_lm_score: discount must be in (0,1), got {discount}"
        )
    toks = F.filter(
        _tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda x: x != F.lit(""),
    )
    padded = F.concat(
        F.array(F.lit(_BOS), F.lit(_BOS)), toks, F.array(F.lit(_EOS))
    )
    # Degenerate-parallelism guard (r17): fan the raw rows out so the
    # tokenize+posexplode (one corpus pass — td below is checkpointed)
    # runs wide on single-split scans; all counts are exact integers.
    from .fanout import fan_out

    emit = (
        fan_out(df.select(id_col, text_col))
        .select(F.col(id_col), padded.alias("_pt"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    # slice position 3 (1-based) = bracket index 2
                    # (0-based): x = _pt[i + 2], history = _pt[i],
                    # _pt[i + 1]
                    "transform(slice(_pt, 3, greatest(size(_pt) - 2, 0)), "
                    "(x, i) -> named_struct("
                    "'w1', _pt[i], 'w2', _pt[i + 1], 'w3', x))"
                )
            ).alias("_pos", "_g"),
        )
        .select(
            F.col(id_col),
            F.col("_g.w1").alias("w1"),
            F.col("_g.w2").alias("w2"),
            F.col("_g.w3").alias("w3"),
        )
    )
    td = emit.groupBy(id_col, "w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("k_occ")
    ).localCheckpoint(eager=False)
    c3 = td.groupBy("w1", "w2", "w3").agg(F.sum("k_occ").alias("c3")).localCheckpoint(
        eager=False
    )
    ctx3 = c3.groupBy("w1", "w2").agg(F.sum("c3").alias("ctot3"))
    nf3 = c3.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nf3"))
    cont2 = c3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cont2")).localCheckpoint(
        eager=False
    )
    mid2 = cont2.groupBy("w2").agg(F.sum("cont2").alias("mid2"))
    nfc = cont2.groupBy("w2").agg(F.count(F.lit(1)).alias("nfc"))
    npre2 = cont2.groupBy("w3").agg(F.count(F.lit(1)).alias("npre2"))
    t2c = cont2.agg(F.count(F.lit(1)).alias("t2c"))
    p2c = (
        (F.col("cont2").cast("double") - F.lit(d)) / F.col("mid2").cast("double")
    ) + (
        (F.lit(d) * F.col("nfc").cast("double")) / F.col("mid2").cast("double")
    ) * (F.col("npre2").cast("double") / F.col("t2c").cast("double"))
    p3 = (
        (F.col("c3").cast("double") - F.lit(d)) / F.col("ctot3").cast("double")
    ) + (
        (F.lit(d) * F.col("nf3").cast("double")) / F.col("ctot3").cast("double")
    ) * p2c
    model = (
        c3.join(ctx3, ["w1", "w2"])
        .join(nf3, ["w1", "w2"])
        .join(cont2, ["w2", "w3"])
        .join(mid2, "w2")
        .join(nfc, "w2")
        .join(npre2, "w3")
        .crossJoin(F.broadcast(t2c))
        .select(
            "w1",
            "w2",
            "w3",
            F.floor(F.round(F.log(p3), 6) * F.lit(1000000) + F.lit(0.5))
            .cast("long")
            .alias("lnp_micro"),
        )
    )
    return (
        td.join(model, ["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.sum("k_occ").alias("n_trigrams"),
            F.sum(F.col("k_occ") * F.col("lnp_micro")).alias("logprob_micro"),
        )
        .select(
            F.col(id_col),
            "n_trigrams",
            "logprob_micro",
            (
                F.col("logprob_micro").cast("double")
                / (F.col("n_trigrams") * F.lit(1000000)).cast("double")
            ).alias("avg_logprob"),
            F.round(
                F.exp(
                    -(
                        F.col("logprob_micro").cast("double")
                        / (F.col("n_trigrams") * F.lit(1000000)).cast("double")
                    )
                ),
                6,
            ).alias("ppl6"),
        )
    )
