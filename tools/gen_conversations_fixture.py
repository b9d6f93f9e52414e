"""Generate the committed chat-JSONL fixture for the conversation
ingest/dedup faces: ``lightfusion_spark/fixtures/data/conversations.jsonl``.

Deterministic (seeded PRNG, fixed key order, ASCII-only) so the file is
byte-stable across regenerations — the same contract as the WARC/JPEG
fixture generators.  The corpus is built to exercise exactly what the
operators claim to handle:

* canned assistant responses repeated VERBATIM across conversations
  (the template-dedup target), plus case/whitespace variants that the
  normalization must collapse;
* whole conversations duplicated under fresh ids (the conversation-
  level dedup target);
* optional leading system turns, 2-8 message conversations, two
  sources.

Run:  python tools/gen_conversations_fixture.py
"""

from __future__ import annotations

import json
import os
import random

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lightfusion_spark",
    "fixtures",
    "data",
    "conversations.jsonl",
)

CANNED = [
    "I cannot help with that request.",
    "Sure! Here is a summary of the key points.",
    "Could you clarify what you mean?",
    "Thanks for asking. The answer is forty two.",
]

USER_POOL = [
    "summarize the report on quarterly shipping volumes",
    "what is the capital of france",
    "translate hello world into spanish",
    "explain how a hash join works",
    "write a haiku about parquet files",
    "why is the sky blue",
    "list three uses for a broadcast variable",
    "how do i collapse duplicate rows",
]

ASSISTANT_POOL = [
    "a hash join builds a table on the small side and probes it",
    "the capital of france is paris",
    "hola mundo",
    "columnar files compress well because values cluster by type",
    "duplicates collapse under a groupby on a content digest",
    "rayleigh scattering favors short wavelengths",
]

SYSTEM_POOL = [
    "you are a helpful assistant",
    "answer concisely",
]


def _variant(rng: random.Random, text: str) -> str:
    """A normalization-equivalent variant: case flip and extra
    whitespace only (the _norm equivalence class)."""
    kind = rng.randrange(3)
    if kind == 0:
        return text.upper()
    if kind == 1:
        return "  " + text.replace(" ", "   ") + " "
    return text.capitalize().replace(" ", " \n ", 1)


def build() -> list[dict]:
    rng = random.Random(20260815)
    convs: list[dict] = []
    for i in range(120):
        msgs = []
        if rng.random() < 0.3:
            msgs.append(
                {"role": "system", "content": rng.choice(SYSTEM_POOL)}
            )
        n_rounds = rng.randrange(1, 4)
        for _ in range(n_rounds):
            msgs.append(
                {"role": "user", "content": rng.choice(USER_POOL)}
            )
            r = rng.random()
            if r < 0.35:  # verbatim canned response (the dedup target)
                content = rng.choice(CANNED)
            elif r < 0.5:  # normalization-equivalent variant of one
                content = _variant(rng, rng.choice(CANNED))
            else:
                content = rng.choice(ASSISTANT_POOL)
            msgs.append({"role": "assistant", "content": content})
        convs.append(
            {
                "conversation_id": f"c{i:05d}",
                "source": "synth_sft" if i % 3 else "synth_eval",
                "messages": msgs,
            }
        )
    # whole-conversation duplicates under fresh ids
    for j, src_idx in enumerate(rng.sample(range(120), 15)):
        dup = dict(convs[src_idx])
        dup = {
            "conversation_id": f"d{j:05d}",
            "source": convs[src_idx]["source"],
            "messages": convs[src_idx]["messages"],
        }
        convs.append(dup)
    # PARAPHRASED re-ingests under fresh ids (round-12 verdict item 3):
    # one light edit — a pleasantry appended to the last user turn — that
    # changes the exact conversation signature but keeps most of the
    # flattened text's shingles, the fuzzy tier's catch target.  Appended
    # AFTER the dup block so the c/d lines stay byte-identical to the
    # round-12 fixture.
    eligible = [i for i in range(120) if len(convs[i]["messages"]) >= 4]
    for j, src_idx in enumerate(rng.sample(eligible, 12)):
        msgs = [dict(m) for m in convs[src_idx]["messages"]]
        k = max(i for i, m in enumerate(msgs) if m["role"] == "user")
        msgs[k]["content"] = msgs[k]["content"] + " please"
        convs.append(
            {
                "conversation_id": f"p{j:05d}",
                "source": convs[src_idx]["source"],
                "messages": msgs,
            }
        )
    # STRUCTURALLY-MALFORMED conversations (the quality-gate targets,
    # round-12 verdict item 4): each violates exactly one check so the
    # gate's verdict columns are individually exercised — including
    # MISSING role/content struct fields, which the PERMISSIVE _corrupt
    # gate cannot catch (the line is well-formed JSON).
    q_blocks = [
        [  # assistant-first (alternation must start with user)
            {"role": "assistant", "content": "hi there"},
            {"role": "user", "content": "who are you"},
        ],
        [  # consecutive user turns
            {"role": "user", "content": "first question"},
            {"role": "user", "content": "second question no reply"},
            {"role": "assistant", "content": "one answer"},
        ],
        [  # system turn mid-stream
            {"role": "user", "content": "hello"},
            {"role": "system", "content": "mid stream instruction"},
            {"role": "assistant", "content": "ok"},
        ],
        [  # unknown role
            {"role": "user", "content": "run the tool"},
            {"role": "tool", "content": "tool output text"},
        ],
        [  # whitespace-only content
            {"role": "user", "content": "say nothing"},
            {"role": "assistant", "content": "   "},
        ],
        [  # missing content field
            {"role": "user", "content": "no content key follows"},
            {"role": "assistant"},
        ],
        [  # missing role field
            {"content": "no role key on this turn"},
            {"role": "assistant", "content": "fine"},
        ],
        [],  # zero turns
    ]
    for j, msgs in enumerate(q_blocks):
        convs.append(
            {
                "conversation_id": f"q{j:05d}",
                "source": "synth_malformed",
                "messages": msgs,
            }
        )
    return convs


def main() -> None:
    convs = build()
    with open(OUT, "w", encoding="ascii") as f:
        for c in convs:
            f.write(
                json.dumps(c, ensure_ascii=True, separators=(",", ":"))
                + "\n"
            )
    print(f"wrote {len(convs)} conversations -> {OUT}")


if __name__ == "__main__":
    main()
