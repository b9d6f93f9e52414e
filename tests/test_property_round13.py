"""Round-13 property-based tests (hypothesis).

The WER operator's load-bearing claim is algebraic: mapping each
pair's distinct words to single characters leaves edit distance
INVARIANT (any per-row bijection works, so Spark and DuckDB may order
their alphabets differently and still agree).  Example tests pin a
handful of cases; these properties pin the claim itself across random
word sequences and random alphabet orderings, plus the metric axioms
the operator's outputs must satisfy.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_evalmetrics import _ref_word_levenshtein


def _char_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


_WORDS = st.lists(
    st.sampled_from([f"w{i}" for i in range(40)]), min_size=0, max_size=25
)


@settings(max_examples=80, deadline=None)
@given(cand=_WORDS, ref=_WORDS, perm_seed=st.integers(0, 2**31 - 1))
def test_word_to_char_encoding_preserves_edit_distance(cand, ref, perm_seed):
    """The operator's trick, proved independent of any engine: encode
    each distinct word as one character under a RANDOM bijection and
    take character-level Levenshtein — equals word-level Levenshtein
    exactly, whatever the alphabet ordering."""
    import random

    words = list(dict.fromkeys(cand + ref))  # first-occurrence order
    random.Random(perm_seed).shuffle(words)  # any bijection must work
    pos = {w: chr(1 + i) for i, w in enumerate(words)}
    enc_c = "".join(pos[w] for w in cand)
    enc_r = "".join(pos[w] for w in ref)
    want = _ref_word_levenshtein(" ".join(cand), " ".join(ref))
    assert _char_levenshtein(enc_c, enc_r) == want


@settings(max_examples=80, deadline=None)
@given(a=_WORDS, b=_WORDS, c=_WORDS)
def test_word_edit_distance_metric_axioms(a, b, c):
    """Identity, symmetry, triangle inequality, and the length bounds
    |len(a)-len(b)| <= d <= max(len) — the sanity envelope every WER
    numerator must live in."""
    d = lambda x, y: _ref_word_levenshtein(" ".join(x), " ".join(y))
    assert d(a, a) == 0
    dab = d(a, b)
    assert dab == d(b, a)
    assert abs(len(a) - len(b)) <= dab <= max(len(a), len(b), 0)
    assert d(a, c) <= dab + d(b, c)


@settings(max_examples=40, deadline=None)
@given(
    turns=st.lists(
        st.tuples(
            st.sampled_from(["system", "user", "assistant"]),
            st.text(
                alphabet="abc xyz",
                min_size=0,
                max_size=20,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_sft_span_arithmetic_invariants(turns):
    """The span fold's invariants, replayed driver-side with the real
    tokenizer: spans are disjoint, ordered, end-exclusive within
    [0, n_tokens], cover exactly the assistant body segments, and
    n_loss_tokens equals their total width."""
    from lightfusion_spark.operators.tokenize import (
        BPETokenizer,
        DEFAULT_MERGES_PATH,
        parse_merges,
    )

    with open(DEFAULT_MERGES_PATH, "r", encoding="utf-8") as fh:
        tok = BPETokenizer(parse_merges(fh.read()))
    off, spans, n_loss = 0, [], 0
    for role, content in turns:
        h = len(tok.encode(f"<|{role}|>\n"))
        b = len(tok.encode(content + "\n"))
        off += h
        if role == "assistant" and b > 0:
            spans.append((off, off + b))
            n_loss += b
        off += b
    assert all(s < e for s, e in spans)
    assert all(e1 <= s2 for (_, e1), (s2, _) in zip(spans, spans[1:]))
    assert all(0 <= s and e <= off for s, e in spans)
    assert sum(e - s for s, e in spans) == n_loss <= off
