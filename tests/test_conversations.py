"""Conversation ingest + turn/conversation dedup (operators/conversations.py)."""

import os

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.fixtures import fixture_path
from lightfusion_spark.operators import conversations as conv_ops

FIXTURE = fixture_path("data", "conversations.jsonl")


@pytest.fixture(scope="module")
def turns(spark):
    raw = conv_ops.read_jsonl_conversations(spark, FIXTURE)
    return conv_ops.conversation_turns(
        raw.where(F.col("_corrupt").isNull())
    ).cache()


def test_fixture_reads_clean_and_turns_explode(spark, turns):
    # cache first: Spark disallows queries whose referenced columns are
    # ONLY the internal corrupt-record column on an uncached json scan
    raw = conv_ops.read_jsonl_conversations(spark, FIXTURE).cache()
    assert raw.count() == 135
    assert raw.where(F.col("_corrupt").isNotNull()).count() == 0
    t = turns.collect()
    # every turn has a role from the chat vocabulary and 0-based indices
    assert {r["role"] for r in t} == {"system", "user", "assistant"}
    per_conv = {}
    for r in t:
        per_conv.setdefault(r["conversation_id"], []).append(r["turn_idx"])
    for cid, idxs in per_conv.items():
        assert sorted(idxs) == list(range(len(idxs))), cid
    # n_turns matches the exploded cardinality
    one = t[0]
    assert len(per_conv[one["conversation_id"]]) == one["n_turns"]


def test_corrupt_lines_are_loud_not_silent(spark, tmp_path):
    p = os.path.join(tmp_path, "bad.jsonl")
    with open(p, "w") as f:
        f.write(
            '{"conversation_id":"ok1","source":"s",'
            '"messages":[{"role":"user","content":"hi"}]}\n'
        )
        f.write("this is not json at all\n")
        f.write('{"conversation_id":"ok2","source":"s","messages":[]}\n')
    raw = conv_ops.read_jsonl_conversations(spark, p)
    rows = raw.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt"]
    assert {r["conversation_id"] for r in rows if r["_corrupt"] is None} == {
        "ok1",
        "ok2",
    }


def test_turn_dedup_normalization_and_role_scoping(spark):
    rows = [
        ("a", 0, "assistant", "I cannot help with that request."),
        ("b", 3, "assistant", "  i CANNOT help   with that request. "),
        ("c", 1, "assistant", "i cannot\nhelp with that request."),
        # same text as a USER turn must NOT merge with the assistant ones
        ("d", 0, "user", "I cannot help with that request."),
        ("e", 2, "assistant", "something else entirely"),
    ]
    df = spark.createDataFrame(
        rows, "conversation_id string, turn_idx int, role string, content string"
    )
    out = {
        (r["role"], r["n_dups"]): r
        for r in conv_ops.dedup_turns_exact(df).collect()
    }
    assert len(out) == 3
    canned = out[("assistant", 3)]
    assert canned["conversation_id"] == "a" and canned["turn_idx"] == 0
    assert ("user", 1) in out and ("assistant", 1) in out
    # survivor pick is (id, idx)-min — partition invariant
    again = conv_ops.dedup_turns_exact(df.repartition(7)).collect()
    assert sorted(map(tuple, again)) == sorted(
        map(tuple, conv_ops.dedup_turns_exact(df).collect())
    )
    # role= filter keeps only that side
    only_a = conv_ops.dedup_turns_exact(df, role="assistant").collect()
    assert all(r["role"] == "assistant" for r in only_a)
    assert len(only_a) == 2


def test_conversation_dedup_finds_planted_duplicates(spark, turns):
    surv = conv_ops.dedup_conversations_exact(turns).cache()
    rows = surv.collect()
    # 135 fixture conversations, 15 planted whole-conversation dups
    assert sum(r["n_dups"] for r in rows) == 135
    assert sum(r["n_dups"] - 1 for r in rows) >= 15
    # min-id survivor: a planted dup (d-prefixed id) can never survive,
    # because its source conversation (c-prefixed) sorts lower
    dup_groups = [r for r in rows if r["n_dups"] >= 2]
    assert dup_groups and all(
        r["conversation_id"].startswith("c") for r in dup_groups
    )
    # signatures match iff the full turn sequence matches: turn counts of
    # survivor and its copies agree by construction
    sig = conv_ops.conversation_signature(turns)
    n_by_sig = {
        r["conv_sig"]: r["n_turns"]
        for r in sig.select("conv_sig", "n_turns").distinct().collect()
    }
    for r in rows:
        assert n_by_sig[r["conv_sig"]] == r["n_turns"]


def test_turn_digest_null_classes(spark):
    """The digest convention is TOTAL (round-12 advice): NULL role and
    NULL content coalesce to '' BEFORE hashing, so a missing struct
    field (which the PERMISSIVE _corrupt gate does not catch) lands in
    the same class as its empty-string twin — never a silent
    concat_ws-skip class, never a Spark/oracle NULL divergence."""
    import duckdb
    import hashlib

    rows = [
        ("n1", 0, "assistant", None),  # NULL content
        ("n2", 0, "assistant", ""),  # empty content — SAME class
        ("n3", 0, None, "hello"),  # NULL role
        ("n4", 0, "", "hello"),  # empty role — SAME class
        ("n5", 0, "assistant", "hello"),  # distinct from all above
    ]
    df = spark.createDataFrame(
        rows, "conversation_id string, turn_idx int, role string, content string"
    )
    got = {
        r["conversation_id"]: r["digest"]
        for r in df.select(
            "conversation_id",
            conv_ops.turn_digest(F.col("role"), F.col("content")).alias(
                "digest"
            ),
        ).collect()
    }
    assert got["n1"] == got["n2"] == hashlib.md5(b"assistant\x1f").hexdigest()
    assert got["n3"] == got["n4"] == hashlib.md5(b"\x1fhello").hexdigest()
    assert got["n5"] == hashlib.md5(b"assistant\x1fhello").hexdigest()
    assert len({got["n1"], got["n3"], got["n5"]}) == 3
    # and the documented DuckDB expression agrees on the NULL rows too
    oracle = duckdb.sql(
        """
        SELECT md5(coalesce(role, '') || chr(31)
                   || regexp_replace(trim(lower(coalesce(content, ''))),
                                     '\\s+', ' ', 'g')) AS d
        FROM (VALUES ('assistant', NULL), (NULL, 'hello'),
                     ('assistant', 'hello')) AS t(role, content)
        """
    ).fetchall()
    assert [r[0] for r in oracle] == [got["n1"], got["n3"], got["n5"]]


def test_turn_dedup_is_idempotent(spark, turns):
    once = conv_ops.dedup_turns_exact(turns)
    survivors_as_turns = once.select(
        "conversation_id",
        "turn_idx",
        "role",
        F.col("digest").alias("content"),  # digest is already normalized id
    )
    twice = conv_ops.dedup_turns_exact(survivors_as_turns)
    assert twice.count() == once.count()
    assert twice.where(F.col("n_dups") != 1).count() == 0
