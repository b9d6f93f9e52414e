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
    assert raw.count() == 155
    assert raw.where(F.col("_corrupt").isNotNull()).count() == 0
    t = turns.collect()
    # chat vocabulary plus the planted q-block deviants: role 'tool'
    # and a MISSING role field (NULL — well-formed JSON the _corrupt
    # gate can't catch; the quality gate reports it)
    assert {r["role"] for r in t} == {
        "system",
        "user",
        "assistant",
        "tool",
        None,
    }
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
    # 155 fixture conversations minus the zero-turn q00007 (explode
    # semantics), 15 planted whole-conversation dups (the 12 planted
    # PARAPHRASES are distinct signatures by design — the exact tier
    # must NOT collapse them; the fuzzy tier catches them,
    # test_fuzzy_tier_catches_planted_paraphrases)
    assert sum(r["n_dups"] for r in rows) == 154
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


def test_fuzzy_tier_catches_planted_paraphrases(spark, turns):
    """The near-dup tier (round-12 verdict item 3): the fixture's 12
    p-prefixed conversations are paraphrased re-ingests (one
    pleasantry appended to a user turn) — ALL clear the exact
    signature tier; banded MinHash over the flattened text catches 10
    of the 12 at Jaccard >= 0.75 (p00000/p00009 are the honest 4-band
    LSH recall misses, pinned here so a recall change is loud)."""
    exact_survivors = {
        r["conversation_id"]
        for r in conv_ops.dedup_conversations_exact(turns).collect()
    }
    p_ids = {f"p{j:05d}" for j in range(12)}
    assert p_ids <= exact_survivors  # exact tier misses every paraphrase

    out = {
        r["conversation_id"]: r
        for r in conv_ops.dedup_conversations_fuzzy(turns).collect()
    }
    # every conversation with >= 1 turn emitted (q00007 has zero)
    assert set(out) >= p_ids and len(out) == 154
    caught = {c for c in p_ids if not out[c]["keep"]}
    assert caught == p_ids - {"p00000", "p00009"}
    for c in caught:
        assert out[c]["max_jaccard"] >= 0.75
        assert out[c]["n_near_dups"] >= 1
    # verbatim d-dups are also fuzzy dups, at jaccard exactly 1.0
    d_caught = [
        r for cid, r in out.items() if cid.startswith("d") and not r["keep"]
    ]
    assert d_caught and all(r["max_jaccard"] == 1.0 for r in d_caught)


def test_quality_gate_flags_each_planted_violation(spark):
    """conversation_quality (round-12 verdict item 4): the q-block
    plants exactly one violation per check; the gate must flag each on
    the right column, pass the well-formed corpus, and stay a pure
    projection (no shuffle)."""
    raw = conv_ops.read_jsonl_conversations(spark, FIXTURE)
    q = conv_ops.conversation_quality(
        raw.where(F.col("_corrupt").isNull())
    ).cache()
    rows = {r["conversation_id"]: r for r in q.collect()}
    assert len(rows) == 155

    assert not rows["q00000"]["alternates_ok"]  # assistant-first
    assert not rows["q00001"]["alternates_ok"]  # double user
    assert not rows["q00002"]["system_only_leading"]  # mid-stream system
    assert rows["q00003"]["n_unknown_role"] == 1  # role 'tool'
    assert rows["q00004"]["n_empty_content"] == 1  # whitespace-only
    assert rows["q00005"]["n_empty_content"] == 1  # missing content key
    assert rows["q00006"]["n_unknown_role"] == 1  # missing role key
    q7 = rows["q00007"]  # zero turns
    assert q7["n_turns"] == 0 and not q7["valid"]
    assert q7["min_len"] is None and q7["avg_len"] is None
    assert all(not rows[f"q{j:05d}"]["valid"] for j in range(8))

    # the well-formed blocks all pass, and length stats are sane
    good = [r for cid, r in rows.items() if not cid.startswith("q")]
    assert good and all(r["valid"] for r in good)
    for r in good:
        assert 0 < r["min_len"] <= r["avg_len"] <= r["max_len"]
    # leading system blocks are tolerated (fixture plants them)
    assert any(r["n_lead_system"] > 0 for r in good)

    # scale contract: a pure projection — no exchange in the plan
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


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


def test_sft_loss_spans_arithmetic(spark):
    """Span offsets are exact per-segment token sums: re-derive them
    driver-side with the same tokenizer over the rendered segments and
    compare, then check mask semantics (assistant bodies only) and the
    mask/total accounting."""
    from lightfusion_spark.operators.tokenize import (
        BPETokenizer,
        DEFAULT_MERGES_PATH,
        parse_merges,
    )

    rows = [
        ("cA", 0, "system", "be brief"),
        ("cA", 1, "user", "what is a parquet file"),
        ("cA", 2, "assistant", "a columnar storage format"),
        ("cA", 3, "user", "thanks"),
        ("cA", 4, "assistant", "you are welcome"),
        ("cB", 0, "user", "only user turns here"),
        ("cB", 1, "user", "still no assistant"),
    ]
    df = spark.createDataFrame(
        rows, "conversation_id string, turn_idx int, role string, content string"
    )
    out = {
        r["conversation_id"]: r
        for r in conv_ops.sft_loss_spans(df).collect()
    }
    with open(DEFAULT_MERGES_PATH, "r", encoding="utf-8") as fh:
        tok = BPETokenizer(parse_merges(fh.read()))

    def seglen(role, content):
        return len(tok.encode(f"<|{role}|>\n")), len(tok.encode(content + "\n"))

    # conversation A: spans cover exactly the two assistant bodies
    offs, spans, total, loss = 0, [], 0, 0
    for _, _, role, content in rows[:5]:
        h, b = seglen(role, content)
        offs += h
        if role == "assistant":
            spans.append(f"{offs}:{offs + b}")
            loss += b
        offs += b
        total += h + b
    a = out["cA"]
    assert a["n_tokens"] == total and a["n_loss_tokens"] == loss
    assert a["n_spans"] == 2 and a["spans"] == " ".join(spans)
    assert 0 < a["n_loss_tokens"] < a["n_tokens"]
    # conversation B: no assistant turn -> empty mask, still emitted
    b = out["cB"]
    assert b["n_spans"] == 0 and b["spans"] == "" and b["n_loss_tokens"] == 0
    assert b["n_tokens"] > 0
    # packing columns present and within the fixed group count
    assert all(0 <= r["pack_group"] < 8 and r["pack_no"] == 0 for r in out.values())
    # partition invariance
    again = {
        r["conversation_id"]: r
        for r in conv_ops.sft_loss_spans(df.repartition(5)).collect()
    }
    assert again == out


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


def test_conversation_dedup_store_stream_matches_one_shot(spark, tmp_path):
    """Maintained conversation-dedup store: turns streamed over a
    two-file source (each file carries complete conversations, ids
    in batch order), gated inside foreachBatch; the store's admitted
    set equals the one-shot dedup_conversations_exact survivors over
    the union, cross-batch re-ingests are dropped, and a replayed
    batch is a no-op."""
    from lightfusion_spark.operators import conversations as conv_ops

    def turns_for(cid, texts):
        return [
            (cid, i, "user" if i % 2 == 0 else "assistant", t)
            for i, t in enumerate(texts)
        ]

    batch1, batch2 = [], []
    for c in range(100, 110):
        batch1 += turns_for(c, [f"q{c}", f"a{c}"])
    batch1 += turns_for(110, ["dup question", "dup answer"])
    # in-batch duplicate of 110 -> min id 110 survives
    batch1 += turns_for(111, ["dup question", "dup answer"])
    for c in range(200, 205):
        batch2 += turns_for(c, [f"q{c}", f"a{c}"])
    # cross-batch re-ingest of 110's transcript -> must NOT survive
    batch2 += turns_for(201_0, ["dup question", "dup answer"])

    schema = "conversation_id long, turn_idx int, role string, content string"
    df1 = spark.createDataFrame(batch1, schema)
    df2 = spark.createDataFrame(batch2, schema)
    src = tmp_path / "conv_src"
    df1.coalesce(1).write.parquet(str(src / "f1"))
    import time

    time.sleep(1.1)
    df2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*/"))
    )
    state_dir = str(tmp_path / "conv_state")

    def process(batch_df, epoch_id):
        conv_ops.conversations_dedup_append_batch(
            batch_df, state_dir, epoch_id
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt_conv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    store = spark.read.parquet(state_dir)
    assert store.select("batch_id").distinct().count() == 2
    got = {
        r["conv_sig"]: r.asDict()
        for r in conv_ops.conversations_dedup_from_store(
            spark, state_dir
        ).collect()
    }
    union_turns = df1.unionByName(df2)
    want = {
        r["conv_sig"]: r.asDict()
        for r in conv_ops.dedup_conversations_exact(union_turns).collect()
    }
    assert set(got) == set(want)
    for sig, w in want.items():
        g = got[sig]
        assert g["conversation_id"] == w["conversation_id"], sig
        assert g["n_turns"] == w["n_turns"]
    # the duplicated transcript survived ONCE, as batch-1's id 110
    dup = [g for g in got.values() if g["conversation_id"] == 110]
    assert len(dup) == 1 and dup[0]["batch_id"] == 0

    # replay batch 1 under its original id: byte-identical re-admit,
    # collapsed on read -> nothing changes
    conv_ops.conversations_dedup_append_batch(df1, state_dir, 0)
    again = {
        r["conv_sig"]: r.asDict()
        for r in conv_ops.conversations_dedup_from_store(
            spark, state_dir
        ).collect()
    }
    assert again == got


def test_fuzzy_conversation_store_blocks_cross_batch_paraphrase(
    spark, tmp_path
):
    """The round-13 verdict's named gap, closed: the exact store gates
    on exact signatures only, so a PARAPHRASED re-ingest across
    batches slips it.  The fuzzy-tiered store persists the admitted
    conversations' LSH band signatures and anti-joins arriving bands:
    a cross-batch paraphrase must NOT survive, the admitted set
    matches the one-shot pipeline (exact survivors filtered by fuzzy
    keep) over the union, and a batch-id replay is a no-op."""
    from lightfusion_spark.operators import conversations as conv_ops

    def turns_for(cid, texts):
        return [
            (cid, i, "user" if i % 2 == 0 else "assistant", t)
            for i, t in enumerate(texts)
        ]

    # distinct conversations: long, shingle-diverse transcripts
    base_q = "how do i configure the retry backoff for the ingest client"
    base_a = (
        "set the retry backoff in the client config block "
        "start with one second and double it on every failed attempt "
        "up to a maximum of thirty seconds then fail the request loudly"
    )
    batch1 = turns_for(100, [base_q, base_a])
    batch1 += turns_for(
        101,
        [
            "what is the difference between a view and a table",
            "a table stores rows a view stores a query that runs "
            "when you read it so a view is always as fresh as its inputs",
        ],
    )
    # batch 2: one genuinely new conversation + a PARAPHRASE of 100
    # (same transcript, one appended pleasantry -> exact sig differs,
    # shingles mostly shared)
    batch2 = turns_for(
        200,
        [
            "how large can a parquet row group be",
            "row groups are typically sized between 64 and 512 "
            "megabytes so a reader can fetch one group per task",
        ],
    )
    batch2 += turns_for(
        201, [base_q, base_a + " hope that helps have a great day"]
    )

    schema = "conversation_id long, turn_idx int, role string, content string"
    df1 = spark.createDataFrame(batch1, schema)
    df2 = spark.createDataFrame(batch2, schema)
    state_dir = str(tmp_path / "fuzzy_conv_state")

    conv_ops.conversations_dedup_append_batch_fuzzy(df1, state_dir, 0)
    conv_ops.conversations_dedup_append_batch_fuzzy(df2, state_dir, 1)

    got = {
        r["conversation_id"]: r.asDict()
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    # the paraphrase was dropped; everything genuinely new admitted
    assert set(got) == {100, 101, 200}
    assert 201 not in got

    # parity with the one-shot pipeline over the union: exact
    # survivors filtered by the verified fuzzy tier's keep
    union_turns = df1.unionByName(df2)
    exact = conv_ops.dedup_conversations_exact(union_turns)
    fuzzy = conv_ops.dedup_conversations_fuzzy(union_turns)
    want = {
        r["conversation_id"]
        for r in exact.join(
            fuzzy.where(F.col("keep")).select("conversation_id"),
            "conversation_id",
            "left_semi",
        ).collect()
    }
    assert set(got) == want

    # replay batch 1 under its original id: no-op after MIN-collapse
    conv_ops.conversations_dedup_append_batch_fuzzy(df1, state_dir, 0)
    again = {
        r["conversation_id"]: r.asDict()
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    assert again == got


def test_fuzzy_conversation_store_within_batch_fuzzy_tier_runs(
    spark, tmp_path
):
    """Within one batch the fuzzy-tiered store applies the full
    VERIFIED tier (threshold Jaccard), not just band candidacy: two
    paraphrases arriving in the SAME batch collapse to the min-id
    survivor, exactly as the one-shot tier decides."""
    from lightfusion_spark.operators import conversations as conv_ops

    text = (
        "please summarize the quarterly report for the northern region "
        "and highlight any unusual spending patterns in the travel budget"
    )
    rows = (
        [(300, 0, "user", text)]
        + [(301, 0, "user", text + " thanks a lot")]
        + [
            (302, 0, "user",
             "completely unrelated question about database indexing "
             "strategies for time series workloads at high ingest rates")
        ]
    )
    schema = "conversation_id long, turn_idx int, role string, content string"
    df = spark.createDataFrame(rows, schema)
    state_dir = str(tmp_path / "fuzzy_wb_state")
    conv_ops.conversations_dedup_append_batch_fuzzy(df, state_dir, 0)
    got = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    assert got == {300, 302}


def test_training_shard_writer_round_trip(spark, tmp_path):
    """write_training_shards round trip: the partitionBy(shard) layout
    holds every conversation of a pack in ONE shard, the union of the
    shard files equals the plan exactly, the written manifest equals
    the plan-side manifest arithmetic, and the assignment is
    deterministic (a second write to a fresh dir is identical)."""
    from lightfusion_spark.operators import conversations as conv_ops

    fixture = (
        "lightfusion_spark/fixtures/data/conversations.jsonl"
    )
    raw = conv_ops.read_jsonl_conversations(spark, fixture)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))

    out = str(tmp_path / "shards")
    manifest = conv_ops.write_training_shards(
        turns, out, n_shards=4, seed=3
    )
    man = {r["shard"]: r.asDict() for r in manifest.collect()}

    plan = conv_ops.training_shard_plan(turns, n_shards=4, seed=3)
    want_man = {
        r["shard"]: r.asDict()
        for r in conv_ops.training_shard_manifest(plan).collect()
    }
    assert man == want_man  # written manifest == plan-side arithmetic

    data = spark.read.parquet(f"{out}/data")
    # round trip: written rows == plan rows (same columns, same values)
    cols = sorted(plan.columns)
    got_rows = sorted(
        tuple(r[c] for c in cols) for r in data.select(*cols).collect()
    )
    want_rows = sorted(
        tuple(r[c] for c in cols) for r in plan.collect()
    )
    assert got_rows == want_rows and len(got_rows) > 0

    # pack atomicity: each pack id appears in exactly one shard
    multi = (
        data.groupBy("pack_id")
        .agg(F.countDistinct("shard").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi == 0

    # determinism: a fresh write produces the identical assignment
    out2 = str(tmp_path / "shards2")
    conv_ops.write_training_shards(turns, out2, n_shards=4, seed=3)
    data2 = spark.read.parquet(f"{out2}/data")
    got2 = sorted(
        tuple(r[c] for c in cols) for r in data2.select(*cols).collect()
    )
    assert got2 == got_rows


def test_training_shard_plan_pack_offsets_are_exact(spark):
    """pack_offset is the running token offset within each pack in
    conversation-id order (the pack_sequences fill order): offsets
    start at 0 per pack, successive members abut exactly, and only
    the straddling member may cross the capacity line."""
    from lightfusion_spark.operators import conversations as conv_ops

    fixture = "lightfusion_spark/fixtures/data/conversations.jsonl"
    raw = conv_ops.read_jsonl_conversations(spark, fixture)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    plan = conv_ops.training_shard_plan(turns, n_shards=4, seed=3)
    rows = sorted(
        (
            (r["pack_group"], r["pack_no"], r["conversation_id"],
             r["pack_offset"], r["n_tokens"])
            for r in plan.collect()
        )
    )
    assert rows
    by_pack = {}
    for g, p, cid, off, n in rows:
        by_pack.setdefault((g, p), []).append((cid, off, n))
    crossing = 0
    for members in by_pack.values():
        members.sort()
        expect = 0
        for cid, off, n in members:
            assert off == expect, (cid, off, expect)
            expect += n
        # at most the LAST member straddles the 512 line
        for cid, off, n in members[:-1]:
            assert off + n <= 512 or off == 0
    # abutting total == pack totals
    assert all(
        members[-1][1] + members[-1][2]
        == sum(n for _, _, n in members)
        for members in by_pack.values()
    )


def test_training_shard_plan_positions_match_shard_assign(spark):
    """The single-consumption rewrite must be assignment-identical to
    the shard_assign composition it replaced: same md5 shard, and the
    dense_rank over the row relation equals shard_assign's row_number
    over the DISTINCT packs (equal (order_hash, pack_id) rows share a
    rank)."""
    from lightfusion_spark.operators import conversations as conv_ops
    from lightfusion_spark.operators.curation import shard_assign

    fixture = "lightfusion_spark/fixtures/data/conversations.jsonl"
    raw = conv_ops.read_jsonl_conversations(spark, fixture)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    plan = conv_ops.training_shard_plan(turns, n_shards=4, seed=3)
    got = {
        r["pack_id"]: (r["shard"], r["pack_pos"])
        for r in plan.select("pack_id", "shard", "pack_pos").collect()
    }
    packs = plan.select("pack_id").distinct()
    want = {
        r["pack_id"]: (r["shard"], r["shard_pos"])
        for r in shard_assign(packs, "pack_id", n_shards=4, seed=3).collect()
    }
    assert got == want and len(got) > 1


def test_fuzzy_store_missing_bands_dir_keeps_exact_gate(spark, tmp_path):
    """Round-15 regression (ADVICE): the two store relations are
    probed INDEPENDENTLY — a missing bands/ dir (crash between the
    two store writes) must disable only the fuzzy gate, never the
    exact one.  The old single try/except around both reads raised on
    the missing bands/ read and silently skipped the exact anti-join
    too, re-admitting verbatim duplicates."""
    import shutil

    from lightfusion_spark.operators import conversations as conv_ops

    def turns_for(cid, texts):
        return [
            (cid, i, "user" if i % 2 == 0 else "assistant", t)
            for i, t in enumerate(texts)
        ]

    q = "how do i configure the retry backoff for the ingest client"
    a = (
        "set the retry backoff in the client config block "
        "start with one second and double it on every failed attempt"
    )
    batch1 = turns_for(100, [q, a]) + turns_for(
        101,
        [
            "what is the difference between a view and a table",
            "a table stores rows a view stores a query that runs "
            "when you read it so a view is always as fresh as its inputs",
        ],
    )
    # batch 2: an EXACT duplicate of 100's transcript + one new conv
    batch2 = turns_for(300, [q, a]) + turns_for(
        301,
        [
            "how large can a parquet row group be",
            "row groups are typically sized between 64 and 512 "
            "megabytes so a reader can fetch one group per task",
        ],
    )
    schema = "conversation_id long, turn_idx int, role string, content string"
    df1 = spark.createDataFrame(batch1, schema)
    df2 = spark.createDataFrame(batch2, schema)
    state_dir = str(tmp_path / "fuzzy_state_nobands")

    conv_ops.conversations_dedup_append_batch_fuzzy(df1, state_dir, 0)
    shutil.rmtree(f"{state_dir}/bands")  # simulate the torn store
    conv_ops.conversations_dedup_append_batch_fuzzy(df2, state_dir, 1)

    got = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    # 300 (verbatim dup of 100) dropped by the still-active exact
    # gate; 301 admitted; the fuzzy tier simply had nothing to gate on
    assert got == {100, 101, 301}


def test_fuzzy_store_verifies_cross_batch_candidates_at_threshold(
    spark, tmp_path
):
    """r15 verdict item 7: the cross-batch fuzzy gate VERIFIES its
    band candidates against the persisted minhash signatures instead
    of dropping on candidacy.  A planted SUB-THRESHOLD collision (one
    shared band, true Jaccard ~0.29, signature agreement 3/8 < 0.5)
    must SURVIVE where the pre-r16 gate dropped it; a planted
    paraphrase still dies; replay is still a no-op.  The collider is
    deterministic: md5-seeded minhashes over the flattened text, found
    by exhaustive search and pinned here."""
    from lightfusion_spark.operators import conversations as conv_ops

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    collider = shared + " " + " ".join(f"w0q{j}" for j in range(10))
    schema = "conversation_id long, turn_idx int, role string, content string"
    df1 = spark.createDataFrame([(100, 0, "user", base)], schema)
    df2 = spark.createDataFrame(
        [
            # the sub-threshold collider: shares a band with 100 but
            # only 3/8 signature positions agree
            (300, 0, "user", collider),
            # a true paraphrase of 100: most positions agree
            (301, 0, "user", base + " hope that helps"),
        ],
        schema,
    )
    state_dir = str(tmp_path / "verified_fuzzy_state")
    conv_ops.conversations_dedup_append_batch_fuzzy(df1, state_dir, 0)
    conv_ops.conversations_dedup_append_batch_fuzzy(df2, state_dir, 1)
    got = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    assert got == {100, 300}  # collider admitted, paraphrase dead

    # replay both batches: no-op
    conv_ops.conversations_dedup_append_batch_fuzzy(df1, state_dir, 0)
    conv_ops.conversations_dedup_append_batch_fuzzy(df2, state_dir, 1)
    again = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state_dir
        ).collect()
    }
    assert again == got

    # legacy-store fallback: without sigs/ the gate degrades to the
    # conservative candidacy-drop (the collider dies, nothing errors)
    import shutil

    legacy = str(tmp_path / "legacy_state")
    conv_ops.conversations_dedup_append_batch_fuzzy(df1, legacy, 0)
    shutil.rmtree(f"{legacy}/sigs")
    conv_ops.conversations_dedup_append_batch_fuzzy(df2, legacy, 1)
    leg = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, legacy
        ).collect()
    }
    assert leg == {100}


def test_fuzzy_store_mixed_sig_coverage_stays_conservative(spark, tmp_path):
    """r16 advice (medium): a store created BEFORE the sigs/ tier
    existed gets sigs/ on its first post-upgrade batch.  From then on
    candidates against pre-upgrade admissions have band rows but no
    sig row — the gate must degrade those PAIRS to the conservative
    candidacy-drop, not silently admit them via an inner sig join.
    Candidates against post-upgrade admissions still get the verified
    treatment (the sub-threshold collider survives)."""
    import shutil

    from lightfusion_spark.operators import conversations as conv_ops

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    other = (
        "zulu yankee xray whiskey victor uniform sierra2 quebec2 papa2 "
        "oscar2 november2 mike2 lima2 kilo2 juliet2 india2 hotel2 golf2"
    )
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    collider = shared + " " + " ".join(f"w0q{j}" for j in range(10))
    schema = "conversation_id long, turn_idx int, role string, content string"
    state = str(tmp_path / "mixed_state")
    # batch 0 admits conversation 100, then loses its sigs (pre-upgrade)
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame([(100, 0, "user", base)], schema), state, 0
    )
    shutil.rmtree(f"{state}/sigs")
    # batch 1 (post-upgrade) admits 200 and recreates sigs/ — a MIXED
    # store: 100 has bands but no sig row, 200 has both
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame([(200, 0, "user", other)], schema), state, 1
    )
    # batch 2: a paraphrase of pre-upgrade 100 (bands collide, no prior
    # sig -> conservative drop) and the sub-threshold collider of 100
    # (also no prior sig -> ALSO dropped, the stated conservative cost)
    conv_ops.conversations_dedup_append_batch_fuzzy(
        spark.createDataFrame(
            [
                (300, 0, "user", base + " hope that helps"),
                (301, 0, "user", collider),
            ],
            schema,
        ),
        state,
        2,
    )
    got = {
        r["conversation_id"]
        for r in conv_ops.conversations_dedup_from_store_fuzzy(
            spark, state
        ).collect()
    }
    assert 300 not in got  # the paraphrase of the sig-less admission dies
    assert 301 not in got  # conservative: candidacy alone drops it
    assert {100, 200} <= got
