"""Edge-case tests for the text-analysis operators (synthetic rows the
parquet corpus can't produce: single words, heavy repetition, real PII
shapes, multi-URL lines)."""

from lightfusion_spark.operators import text as text_ops


def _rows(df):
    return {r[0]: tuple(r[1:]) for r in df.collect()}


def test_repetition_stats_flags_repeats(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are fully distinct tokens"),
            (3, "solo"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(text_ops.repetition_stats(df, "doc_id", "text"))
    n_words, top, d2, d3, keep = out[1]
    assert (n_words, top) == (4, 1.0)
    assert d2 == 1.0 - 1.0 / 3.0 and d3 == 0.5 and keep is False
    assert out[2][4] is True  # distinct doc keeps
    # single word: no n-grams -> fractions 0, top_word_frac 1
    assert out[3] == (1, 1.0, 0.0, 0.0, False)


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e-f.org, ip 10.0.0.1, call +4930123456"),
            (2, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(text_ops.pii_redact(df, "doc_id", "text"))
    n_emails, n_ips, n_phones, clean = out[1]
    assert (n_emails, n_ips, n_phones) == (2, 1, 1)
    assert clean == "mail [EMAIL] and [EMAIL], ip [IP], call [PHONE]"
    assert out[2] == (0, 0, 0, "nothing sensitive here")


def test_redact_pii_full_chain(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co see https://x.net/p card 4111 1111 1111 1234 ok"),
            (2, "ssn 123-45-6789 iban DE44500105175407324931 call +4915112345678"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in
           text_ops.redact_pii(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert (r1["n_emails"], r1["n_urls"], r1["n_cards"]) == (1, 1, 1)
    assert r1["n_redacted"] == 3
    assert r1["text_redacted"] == "mail [EMAIL] see [URL] card [CARD] ok"
    r2 = got[2]
    assert (r2["n_ssns"], r2["n_ibans"], r2["n_phones"]) == (1, 1, 1)
    assert r2["text_redacted"] == "ssn [SSN] iban [IBAN] call [PHONE]"
    r3 = got[3]
    assert r3["n_redacted"] == 0 and r3["text_redacted"] == "nothing sensitive here"


def test_redact_pii_chain_order_on_overlap(spark):
    """Chain order is fixed: a URL containing an email-shaped token is
    counted by BOTH classes (counts are on the original text) but the
    EMAIL replacement fires first, splitting the URL span — determinism,
    not double-redaction, is the contract."""
    df = spark.createDataFrame(
        [(1, "go https://u@example.com/path now")], ["doc_id", "text"]
    )
    row = text_ops.redact_pii(df, "doc_id", "text").collect()[0]
    assert row["n_emails"] == 1 and row["n_urls"] == 1
    # email replaced first ('https://[EMAIL]/path'), then the URL pass
    # consumes the whole remaining span — one typed token survives
    assert row["text_redacted"] == "go [URL] now"


def test_url_stats_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://A.example.com/x and http://b.net/y https://a.example.com/z"),
            (2, "no links"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(text_ops.url_stats(df, "doc_id", "text"))
    assert out[1] == (3, "a.example.com", 2)
    assert out[2] == (0, None, 0)


def test_bm25_zero_match_and_monotonic_tf(spark):
    """Docs with no query-term hit score exactly 0.0; with equal length,
    more hits of the same term strictly increase the score."""
    df = spark.createDataFrame(
        [
            (1, "spark spark spark pad"),
            (2, "spark pad pad pad"),
            (3, "pad pad pad pad"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(text_ops.bm25_scores(df, "doc_id", "text", ["spark"]))
    assert out[3] == (4, 0.0)
    n1, s1 = out[1]
    n2, s2 = out[2]
    assert n1 == n2 == 4
    assert s1 > s2 > 0.0


def test_boilerplate_lines_threshold_and_empty_lines(spark):
    docs = spark.createDataFrame(
        [
            (1, "FOOTER\nunique one\n\nNAV"),
            (2, "FOOTER\nunique two\nNAV"),
            (3, "FOOTER\nunique three"),
            (4, "solo document"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(
        text_ops.boilerplate_lines(docs, "doc_id", "text", min_doc_frac=0.5)
    )
    # FOOTER in 3/4 docs, NAV in 2/4 (= threshold, inclusive); empty line
    # ignored; unique lines absent
    assert out == {"FOOTER": (3, 0.75), "NAV": (2, 0.5)}


def test_strip_boilerplate_rebuild_order_and_all_boilerplate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "FOOTER\nalpha\nFOOTER\nbeta"),
            (2, "FOOTER\nFOOTER"),
            (3, "gamma\ndelta"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(
        text_ops.strip_boilerplate(docs, "doc_id", "text", min_doc_frac=0.6)
    )
    # FOOTER (2/3 docs) stripped wherever it appears; line order kept;
    # doc 2 becomes empty but still present
    assert out[1] == ("alpha\nbeta", 4, 2)
    assert out[2] == ("", 2, 2)
    assert out[3] == ("gamma\ndelta", 2, 0)


def test_chunk_documents_windows_and_tail(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "a b"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = text_ops.chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in out.collect()}
    # stride 3: starts at 0 and 3 for the 7-token doc — the second window
    # reaches the end, so no redundant third chunk is emitted
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    # docs shorter than one chunk emit exactly one chunk
    assert rows[(2, 0)] == (2, "a b")
    assert rows[(3, 0)] == (1, "solo")
    assert len(rows) == 4
    # every token of doc 1 appears in some chunk (coverage), and
    # consecutive chunks overlap by exactly `overlap` where full-length
    assert rows[(1, 0)][1].split()[-1] == rows[(1, 1)][1].split()[0]
    with pytest.raises(ValueError, match="overlap"):
        text_ops.chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        text_ops.chunk_documents(docs, "doc_id", "text", chunk_tokens=0)


def test_strip_boilerplate_regex_metachar_separator(spark):
    docs = spark.createDataFrame(
        [(1, "FOOTER|alpha|beta"), (2, "FOOTER|gamma"), (3, "FOOTER")],
        ["doc_id", "text"],
    )
    out = _rows(
        text_ops.strip_boilerplate(docs, "doc_id", "text", min_doc_frac=0.9, sep="|")
    )
    # '|' must split literally (not as regex alternation) and rebuild with
    # the same literal separator
    assert out[1] == ("alpha|beta", 3, 1)
    assert out[2] == ("gamma", 2, 1)
    assert out[3] == ("", 1, 1)


def test_chunk_documents_reconstruction_invariant(spark):
    """Over random docs: chunk 0's tokens plus every later chunk's tokens
    beyond the overlap reconstruct the document exactly, and every chunk
    except the last is full-length."""
    import numpy as np

    rng = np.random.RandomState(3)
    words = ["w%d" % i for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(words, size=rng.randint(1, 60))))
        for i in range(50)
    ]
    chunk_tokens, overlap = 7, 3
    stride = chunk_tokens - overlap
    out = text_ops.chunk_documents(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        "doc_id", "text", chunk_tokens=chunk_tokens, overlap=overlap,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for doc_id, text in docs:
        toks = text.split()
        chunks = by_doc[doc_id]
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt = []
        for cid in sorted(chunks):
            ctoks = chunks[cid]["chunk_text"].split()
            assert chunks[cid]["n_chunk_tokens"] == len(ctoks)
            if cid < len(chunks) - 1:
                assert len(ctoks) == chunk_tokens
            rebuilt.extend(ctoks if cid == 0 else ctoks[overlap:])
            assert ctoks == toks[cid * stride : cid * stride + chunk_tokens]
        assert rebuilt == toks, doc_id


def test_strip_boilerplate_identity_when_nothing_qualifies(spark):
    """With a threshold no line can reach, strip is the identity transform
    modulo empty-line removal — over random multi-line docs."""
    import numpy as np

    rng = np.random.RandomState(4)
    docs = []
    for i in range(30):
        lines = [
            "".join(rng.choice(list("abc "), size=rng.randint(0, 8)))
            for _ in range(rng.randint(1, 10))
        ]
        docs.append((i, "\n".join(lines)))
    out = {
        r["doc_id"]: r
        for r in text_ops.strip_boilerplate(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "doc_id", "text", min_doc_frac=1.1,
        ).collect()
    }
    for i, text in docs:
        nonempty = [l for l in text.split("\n") if l]
        assert out[i]["clean_text"] == "\n".join(nonempty), i
        assert out[i]["n_lines"] == len(nonempty)
        assert out[i]["n_removed"] == 0


def test_ngram_lm_penalizes_shuffled_word_order(spark):
    """The reason the trigram model exists: shuffled word salad has the
    SAME unigram distribution as natural text (identical unigram score)
    but improbable transitions (higher trigram NLL)."""
    base = "the cat sat on the mat and the dog sat on the rug".split()
    natural = " ".join(base)
    shuffled = " ".join(
        [base[i] for i in [7, 2, 11, 0, 9, 4, 1, 12, 5, 3, 10, 8, 6]]
    )
    # a background corpus of natural-order sentences trains the model
    rows = [(i, natural) for i in range(10)] + [(100, shuffled)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {
        r["doc_id"]: r["avg_nll"]
        for r in text_ops.unigram_lm_score(df, "doc_id", "text").collect()
    }
    tri = {
        r["doc_id"]: r["avg_nll"]
        for r in text_ops.ngram_lm_score(df, "doc_id", "text").collect()
    }
    assert abs(uni[100] - uni[0]) < 1e-9  # unigram is blind to order
    assert tri[100] > tri[0] + 0.5  # trigram is not


def test_ngram_lm_counts_every_token_once(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_toks"] for r in
           text_ops.ngram_lm_score(df, "doc_id", "text").collect()}
    # empty text tokenizes to one empty token, matching unigram_lm_score
    assert out == {1: 3, 2: 1, 3: 1}


def test_embed_text_shape_and_null_handling(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "spark join data"), (2, None), (3, "spark join data")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["embedding"]
            for r in text_ops.embed_text_tfidf(df, "doc_id", "text", dim=16).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(len(v) == 16 for v in rows.values())
    assert rows[2] == [0.0] * 16          # null text -> zero vector
    assert rows[1] == rows[3]             # deterministic
    assert any(x != 0.0 for x in rows[1])
    with _pytest.raises(ValueError, match="dim"):
        text_ops.embed_text_tfidf(df, "doc_id", "text", dim=0)


def test_embed_text_lexical_similarity_orders_cosine(spark):
    """Near-identical docs must land closer (cosine) than unrelated ones
    — the property the downstream ANN relies on."""
    import math

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated vocabulary about spark shuffles"),
        ],
        ["doc_id", "text"],
    )
    v = {r["doc_id"]: r["embedding"]
         for r in text_ops.embed_text_tfidf(df, "doc_id", "text", dim=32).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert cos(v[1], v[2]) > cos(v[1], v[3])
    assert cos(v[1], v[2]) > cos(v[2], v[3])


def test_split_sentences_rules(spark):
    from lightfusion_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, 'First one. Second, with 3.14 inside! "Quoted?" Yes. last stays joined'),
            (2, "   "),
        ],
        "doc_id long, text string",
    )
    rows = [
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in text_ops.split_sentences(df, "doc_id", "text").collect()
    ]
    got = [s for (_, _, s) in rows]
    # decimal 3.14 must NOT split (no following capital); lowercase
    # continuation after '.' must not split either
    assert got == [
        "First one.",
        "Second, with 3.14 inside!",
        '"Quoted?"',
        "Yes. last stays joined",
    ]
    # whitespace-only doc contributes nothing
    assert all(d == 1 for (d, _, _) in rows)
    assert [i for (_, i, _) in rows] == [0, 1, 2, 3]


def test_chunk_by_sentences_never_splits_sentences(spark):
    from lightfusion_spark.operators import text as text_ops

    text = "Aaaa bbbb. Cccc dddd. Eeee ffff. Gggg hhhh."  # 4 x ~10-char sents
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = {
        r["chunk_idx"]: r
        for r in text_ops.chunk_by_sentences(df, "doc_id", "text", max_chars=22).collect()
    }
    # every chunk boundary falls BETWEEN sentences
    for r in chunks.values():
        assert r["chunk_text"].endswith(".")
        assert r["n_sents"] >= 1
    # all sentences preserved, in order, exactly once
    joined = " ".join(chunks[i]["chunk_text"] for i in sorted(chunks))
    assert joined == text
    assert sum(r["n_sents"] for r in chunks.values()) == 4
    assert len(chunks) >= 2  # max_chars forced a split


def test_normalize_unicode_folds_dedup_misses(spark):
    from lightfusion_spark.operators import text as text_ops

    composed = "café"   # e + combining acute
    precomposed = "café"      # é
    df = spark.createDataFrame(
        [(1, composed), (2, precomposed), (3, "a\x00b\tc\nd"), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["text"]
        for r in text_ops.normalize_unicode(df, "text").collect()
    }
    assert rows[1] == rows[2] == precomposed  # NFC merges the variants
    assert rows[3] == "ab\tc\nd"              # NUL stripped, tab/newline kept
    assert rows[4] is None
    # NFKC additionally folds compatibility chars (the ligature ﬁ)
    df2 = spark.createDataFrame([(1, "ﬁle")], "doc_id long, text string")
    (r,) = text_ops.normalize_unicode(df2, "text", form="NFKC").collect()
    assert r["text"] == "file"
    import pytest

    with pytest.raises(ValueError, match="unknown form"):
        text_ops.normalize_unicode(df, "text", form="NFX")


def test_top_terms_tfidf_ranks_distinctive_terms(spark):
    from lightfusion_spark.operators.text import top_terms_tfidf

    df = spark.createDataFrame(
        [
            (1, "zebra zebra zebra common common"),
            (2, "common words only here"),
            (3, "common words appear everywhere"),
        ],
        "doc_id long, text string",
    )
    got = top_terms_tfidf(df, "doc_id", "text", k=2)
    rows = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in got.collect()}
    # doc 1: 'zebra' (df=1, tf=3) must outrank 'common' (df=3)
    assert rows[(1, 1)][0] == "zebra"
    assert rows[(1, 2)][0] == "common"
    assert rows[(1, 1)][1] > rows[(1, 2)][1]
    # every doc gets at most k rows, ranks are 1..k, ties deterministic
    for (doc, rank) in rows:
        assert 1 <= rank <= 2
    again = {(r["doc_id"], r["rank"]): (r["term"], r["score"])
             for r in top_terms_tfidf(df.repartition(5), "doc_id", "text", k=2).collect()}
    assert again == rows


def test_redact_pii_null_text_is_empty(spark):
    """NULL documents (round-10 ADVICE): counts are 0 — never -1/NULL —
    and text_redacted is '' rather than NULL."""
    df = spark.createDataFrame(
        [(1, None), (2, "mail a@b.co")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in
           text_ops.redact_pii(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert r1["n_redacted"] == 0 and r1["text_redacted"] == ""
    assert all(
        v == 0 for k, v in r1.items() if k.startswith("n_") and k != "n_redacted"
    )
    assert got[2]["n_emails"] == 1


def test_token_entropy_values_and_bounds(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform: H = ln 4, norm = 1
            (2, "x x x"),            # single type: H = 0, norm = 0 by convention
            (3, "a a a a b"),        # concentrated
            (4, "a b c d e"),        # uniform, 5 types
            (5, ""),                 # no tokens: excluded
            (6, None),               # NULL: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           text_ops.token_entropy(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["n_tokens"] == 4 and got[1]["n_types"] == 4
    assert abs(got[1]["entropy_e6"] / 1e6 - math.log(4)) < 2e-6
    # micro-nat flooring can overshoot ln(n)*1e6 by a few units, but the
    # r12 LEAST clamp keeps the 0..1 contract literal
    assert abs(got[1]["norm_entropy6"] - 1.0) < 5e-6
    assert got[1]["norm_entropy6"] <= 1.0
    assert got[4]["norm_entropy6"] <= 1.0
    assert got[2]["entropy_e6"] == 0 and got[2]["norm_entropy6"] == 0.0
    # concentration lowers entropy below the uniform doc of equal length
    assert got[3]["entropy_e6"] < got[4]["entropy_e6"]
    assert 0.0 <= got[3]["norm_entropy6"] < 1.0


def test_token_entropy_partition_invariant(spark):
    rows = [(i, " ".join(f"w{j % (1 + i % 7)}" for j in range(20)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, text_ops.token_entropy(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, text_ops.token_entropy(
        df.repartition(11), "doc_id", "text").collect()))
    assert a == b


def _kn_reference(docs, D=0.75):
    """Independent driver-side interpolated Kneser-Ney bigram scorer."""
    import math
    from collections import Counter, defaultdict

    BOS, EOS = "\x02", "\x03"
    streams = {i: [BOS] + (t or "").lower().split() + [EOS] for i, t in docs}
    bigrams = Counter()
    for s in streams.values():
        for a, b in zip(s, s[1:]):
            bigrams[(a, b)] += 1
    ctot, nfollow, nprec = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b), c in bigrams.items():
        ctot[a] += c
        nfollow[a] += 1
        nprec[b] += 1
    T = len(bigrams)

    def lnp(a, b):
        c = bigrams[(a, b)]
        p = ((c - D) / ctot[a]) + ((D * nfollow[a]) / ctot[a]) * (nprec[b] / T)
        return math.floor(round(math.log(p), 6) * 1e6 + 0.5)

    out = {}
    for i, s in streams.items():
        ms = [lnp(a, b) for a, b in zip(s, s[1:])]
        n, micro = len(ms), sum(ms)
        avg = micro / (n * 1e6)
        out[i] = (n, micro, avg, round(math.exp(-avg), 6))
    return out, (bigrams, ctot, nfollow, nprec, T)


def test_kn_matches_independent_reference(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["logprob_micro"], r["avg_logprob"], r["ppl6"])
        for r in text_ops.kn_bigram_lm_score(df, "id", "text").collect()
    }
    exp, (bigrams, ctot, nfollow, nprec, T) = _kn_reference(docs)
    assert got == exp
    # empty and NULL documents both score exactly one BOS->EOS bigram
    assert got[4][0] == 1 and got[4] == got[5]
    # KN sanity on the underlying model: summing P(w2|w1) over the FULL
    # vocab (max(c-D,0) for unseen bigrams) is exactly 1 per context
    vocab = {b for _, b in bigrams} | {a for a, _ in bigrams}
    D = 0.75
    for w1 in ("the", "a", "\x02"):
        tot = sum(
            max(bigrams.get((w1, w2), 0) - D, 0) / ctot[w1]
            + ((D * nfollow[w1]) / ctot[w1]) * (nprec.get(w2, 0) / T)
            for w2 in vocab
        )
        assert abs(tot - 1.0) < 1e-9, (w1, tot)
    # bitwise partition invariance
    again = {
        r["id"]: (r["n_bigrams"], r["logprob_micro"], r["avg_logprob"], r["ppl6"])
        for r in text_ops.kn_bigram_lm_score(df.repartition(3), "id", "text").collect()
    }
    assert again == got


def test_kn_discriminates_fluent_from_salad_and_guards(spark):
    import pytest as _pytest

    # 30 fluent repeats of the same sentence + 1 salad doc built from the
    # SAME unigrams: a unigram model can't separate them, transitions can
    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)]
    salad = [(100, "dog the over quick lazy jumps brown the fox")]
    df = spark.createDataFrame(fluent + salad, "id long, text string")
    got = {r["id"]: r["ppl6"] for r in
           text_ops.kn_bigram_lm_score(df, "id", "text").collect()}
    assert got[100] > 2 * got[0]
    with _pytest.raises(ValueError, match="discount"):
        text_ops.kn_bigram_lm_score(df, "id", "text", discount=1.5)


def _kn3_reference(docs, D=0.75):
    """Independent driver-side interpolated trigram KN."""
    import math
    from collections import Counter, defaultdict

    B, E = "\x02", "\x03"
    streams = {i: [B, B] + (t or "").lower().split() + [E] for i, t in docs}
    tri = Counter()
    for s in streams.values():
        for a, b, c in zip(s, s[1:], s[2:]):
            tri[(a, b, c)] += 1
    ctx3, nf3, cont2 = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b, c), k in tri.items():
        ctx3[(a, b)] += k
        nf3[(a, b)] += 1
        cont2[(b, c)] += 1
    mid2, nfc, npre2 = defaultdict(int), defaultdict(int), defaultdict(int)
    for (b, c), v in cont2.items():
        mid2[b] += v
        nfc[b] += 1
        npre2[c] += 1
    T2c = len(cont2)

    def lnp(a, b, c):
        p2c = ((cont2[(b, c)] - D) / mid2[b]) + (
            (D * nfc[b]) / mid2[b]
        ) * (npre2[c] / T2c)
        p3 = ((tri[(a, b, c)] - D) / ctx3[(a, b)]) + (
            (D * nf3[(a, b)]) / ctx3[(a, b)]
        ) * p2c
        return math.floor(round(math.log(p3), 6) * 1e6 + 0.5)

    out = {}
    for i, s in streams.items():
        ms = [lnp(a, b, c) for a, b, c in zip(s, s[1:], s[2:])]
        n, micro = len(ms), sum(ms)
        avg = micro / (n * 1e6)
        out[i] = (n, micro, avg, round(math.exp(-avg), 6))
    return out, (tri, ctx3, nf3, cont2, mid2, nfc, npre2, T2c)


def test_kn_trigram_matches_reference_and_normalizes(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog sat"),
        (4, ""),
        (5, None),
        (6, "the cat sat on the mat"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["n_trigrams"], r["logprob_micro"],
                  r["avg_logprob"], r["ppl6"])
        for r in text_ops.kn_trigram_lm_score(df, "id", "text").collect()
    }
    exp, (tri, ctx3, nf3, cont2, mid2, nfc, npre2, T2c) = _kn3_reference(docs)
    assert got == exp
    # empty and NULL docs both score exactly two trigrams (BB->w=EOS
    # has only one real position: BOS BOS EOS -> 1 trigram)
    assert got[4] == got[5] and got[4][0] == 1
    # the duplicated document scores strictly better than singletons
    assert got[1][3] < got[2][3]
    # KN telescoping identity: sum over the FULL vocab of P3(c|a,b)
    # (max(.-D, 0) for unseen counts) is exactly 1 per seen history
    D = 0.75
    vocab = ({c for _, _, c in tri} | {b for _, b, _ in tri}
             | {a for a, _, _ in tri})
    for hist in [("the", "cat"), ("\x02", "\x02")]:
        a, b = hist
        tot = sum(
            (max(tri.get((a, b, c), 0) - D, 0) / ctx3[hist])
            + ((D * nf3[hist]) / ctx3[hist]) * (
                (max(cont2.get((b, c), 0) - D, 0) / mid2[b])
                + ((D * nfc[b]) / mid2[b]) * (npre2.get(c, 0) / T2c)
            )
            for c in vocab
        )
        assert abs(tot - 1.0) < 1e-9
    # bitwise partition invariance
    again = {
        r["id"]: (r["n_trigrams"], r["logprob_micro"],
                  r["avg_logprob"], r["ppl6"])
        for r in text_ops.kn_trigram_lm_score(
            df.repartition(3), "id", "text").collect()
    }
    assert again == got


def test_kn_trigram_beats_bigram_on_order_and_guards(spark):
    import pytest as _pytest

    # trigram context separates texts a bigram model scores identically:
    # both corpora share ALL bigrams, differ only in trigram composition
    fluent = [(i, "a b c d a b c d") for i in range(20)]
    # same bigram multiset pairs (a b, b c, c d, d a) but rarer trigram path
    twisted = [(100, "a b c d a b c d"), (101, "c d a b c d a b")]
    df = spark.createDataFrame(fluent + twisted, "id long, text string")
    tri_scores = {r["id"]: r["ppl6"] for r in
                  text_ops.kn_trigram_lm_score(df, "id", "text").collect()}
    # the dominant pattern scores better than the rotated one
    assert tri_scores[0] < tri_scores[101]
    with _pytest.raises(ValueError, match="discount"):
        text_ops.kn_trigram_lm_score(df, "id", "text", discount=0.0)
