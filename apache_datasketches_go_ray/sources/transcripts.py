"""Deterministic synthetic transcript tables (FIXTURES.md F1/F2/F4).

Schema (BASELINE.json input_hint): conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us].

Pure functions of (seed, size): every array derives from
numpy.default_rng(seed) (PCG64 — stable across platforms/versions), so
pipeline-vs-oracle comparisons are exact across runs and parallelism
levels. Rows are written shuffled across convs/turns so the pipeline's
groupby(conv_id) + stable turn_idx sort is actually exercised.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
EPOCH_US = 1_700_000_000_000_000  # fixed base, no wall-clock reads

_VOCAB = None


def vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)
    return _VOCAB


_ZIPF_CDF = None


def _zipf_tokens(rng: np.random.Generator, n: int) -> np.ndarray:
    """Zipf(1.3)-distributed token ids truncated to the vocabulary, via
    inverse-CDF sampling (numpy's rejection sampler is ~60x slower for
    a < 2 and was clipped to the same truncated distribution anyway)."""
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        w = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64) ** -1.3
        _ZIPF_CDF = np.cumsum(w / w.sum())
    return np.searchsorted(_ZIPF_CDF, rng.random(n), side="left").astype(np.int64)


def generate_conversations(n_convs: int, seed: int = 42) -> list[dict]:
    """List of conv dicts: {conv_id, turns: [text...], roles, tools}.

    Vectorized: all turn texts are built in one pyarrow ``binary_join``
    over the flat zipf token stream (no per-turn Python join), so bench
    fixtures of hundreds of thousands of conversations generate in
    seconds. Draw order matches the original generator (n_turns,
    toks_per_turn, token_ids, tool_draw, tool_kind from one rng)."""
    rng = np.random.default_rng(seed)
    V = vocab()
    n_turns = rng.integers(2, 25, size=n_convs)
    total_turns = int(n_turns.sum())
    toks_per_turn = rng.integers(5, 201, size=total_turns)
    total_tokens = int(toks_per_turn.sum())
    token_ids = _zipf_tokens(rng, total_tokens)
    tool_draw = rng.random(total_turns)
    tool_kind = rng.integers(0, 3, size=total_turns)
    tool_names = np.array(["search", "code", "browse"], dtype=object)

    # all turn texts at once: list<token string> -> " "-joined strings
    vocab_arr = pa.array(V, type=pa.string())
    tok_offsets = np.zeros(total_turns + 1, dtype=np.int64)
    np.cumsum(toks_per_turn, out=tok_offsets[1:])
    # large_list/large_string: total token count exceeds int32 offsets at
    # bench scale (hundreds of millions of tokens)
    tok_list = pa.LargeListArray.from_arrays(
        pa.array(tok_offsets, type=pa.int64()),
        vocab_arr.cast(pa.large_string()).take(
            pa.array(token_ids, type=pa.int64())),
    )
    all_texts = pc.binary_join(
        tok_list, pa.scalar(" ", type=pa.large_string())).to_pylist()

    # roles/tools per turn (same rule as the row-wise generator)
    turn_in_conv = _ranges(n_turns)
    is_user = turn_in_conv % 2 == 0
    is_tool = (~is_user) & (tool_draw < 0.1)
    roles_all = np.where(is_user, "user",
                         np.where(is_tool, "tool", "assistant")).tolist()
    tools_all = np.where(is_tool, tool_names[tool_kind], "").tolist()

    conv_offsets = np.zeros(n_convs + 1, dtype=np.int64)
    np.cumsum(n_turns, out=conv_offsets[1:])
    convs = []
    for ci in range(n_convs):
        s, e = int(conv_offsets[ci]), int(conv_offsets[ci + 1])
        convs.append({
            "conv_id": f"conv-{ci:08d}",
            "texts": all_texts[s:e],
            "roles": roles_all[s:e],
            "tools": tools_all[s:e],
        })
    return convs


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] (vectorized per-segment aranges)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def inject_duplicates(
    convs: list[dict], seed: int = 43, dup_frac: float = 0.2
) -> tuple[list[dict], list[dict]]:
    """Plant labeled duplicate groups (FIXTURES.md F2).

    Returns (convs_with_dups, dup_groups) where dup_groups rows are
    {conv_id, group_id, kind}. Group members 2-5; kinds: exact, near
    (1/5/10% token substitution), containment (contiguous 50-80% turn
    range), reorder (same turns, rows later shuffled — tests stable
    ordering). Negative decoys share vocabulary but are fresh convs.
    """
    rng = np.random.default_rng(seed)
    V = vocab()
    n_base = len(convs)
    n_groups = max(1, int(n_base * dup_frac / 3))
    base_ids = rng.choice(n_base, size=n_groups, replace=False)
    out = list(convs)
    groups = []
    next_id = n_base
    kinds_cycle = ["exact", "near1", "near5", "near10", "containment", "reorder"]
    for gi, bi in enumerate(base_ids):
        base = convs[int(bi)]
        group_id = f"g{gi:06d}"
        groups.append({"conv_id": base["conv_id"], "group_id": group_id, "kind": "base"})
        n_members = int(rng.integers(1, 5))  # 1-4 copies -> group size 2-5
        for mi in range(n_members):
            kind = kinds_cycle[int(rng.integers(0, len(kinds_cycle)))]
            texts = list(base["texts"])
            roles = list(base["roles"])
            tools = list(base["tools"])
            if kind.startswith("near"):
                p = {"near1": 0.01, "near5": 0.05, "near10": 0.10}[kind]
                new_texts = []
                for t in texts:
                    words = t.split(" ")
                    n_sub = rng.binomial(len(words), p)
                    if n_sub:
                        pos = rng.choice(len(words), size=n_sub, replace=False)
                        repl = rng.integers(0, VOCAB_SIZE, size=n_sub)
                        for pp, rr in zip(pos, repl):
                            words[int(pp)] = V[int(rr)]
                    new_texts.append(" ".join(words))
                texts = new_texts
            elif kind == "containment":
                frac = rng.uniform(0.5, 0.8)
                keep = max(1, int(len(texts) * frac))
                if rng.random() < 0.5:
                    texts, roles, tools = texts[:keep], roles[:keep], tools[:keep]
                else:
                    texts, roles, tools = texts[-keep:], roles[-keep:], tools[-keep:]
            # exact / reorder: identical content (reorder only shuffles row
            # order at write time, which the global shuffle already does)
            cid = f"conv-{next_id:08d}"
            next_id += 1
            out.append({"conv_id": cid, "texts": texts, "roles": roles, "tools": tools})
            groups.append({"conv_id": cid, "group_id": group_id, "kind": kind})
    return out, groups


def conversations_to_table(convs: list[dict], seed: int = 44) -> pa.Table:
    """Flatten to the input_hint row schema, rows shuffled deterministically."""
    n_turns = np.array([len(c["texts"]) for c in convs], dtype=np.int64)
    n = int(n_turns.sum())
    conv_rep = np.repeat(np.arange(len(convs)), n_turns)
    turn_idxs = _ranges(n_turns)
    texts: list = []
    roles: list = []
    tools: list = []
    for c in convs:
        texts.extend(c["texts"])
        roles.extend(c["roles"])
        tools.extend(c["tools"])
    conv_id_arr = pa.array([c["conv_id"] for c in convs], type=pa.string())
    tss = EPOCH_US + conv_rep * 3_600_000_000 + turn_idxs * 30_000_000
    rng = np.random.default_rng(seed)
    perm = pa.array(rng.permutation(n), type=pa.int64())
    tbl = pa.table(
        {
            "conv_id": conv_id_arr.take(pa.array(conv_rep)).take(perm),
            "turn_idx": pa.array(turn_idxs.astype(np.int32)).take(perm),
            "role": pa.array(roles, type=pa.string()).take(perm),
            "text": pa.array(texts, type=pa.large_string()).take(perm),
            "tool": pa.array(tools, type=pa.string()).take(perm),
            "ts": pa.array(tss, type=pa.timestamp("us")).take(perm),
        }
    )
    return tbl


def make_skewed_conversations(n_convs: int, seed: int = 42,
                              boilerplate_frac: float = 0.3,
                              hot_copies: int = 300) -> list[dict]:
    """FIXTURES.md F4: F1 conversations plus (a) an identical boilerplate
    opening turn on ~boilerplate_frac of convs (system-prompt analogue)
    and (b) one hot conv template repeated hot_copies times with 1-2
    seeded token edits — drives the hot-band salted-repartition path."""
    convs = generate_conversations(n_convs, seed)
    rng = np.random.default_rng(seed + 7)
    V = vocab()
    bp = " ".join(V[i] for i in range(40))  # fixed boilerplate turn
    chosen = rng.random(n_convs) < boilerplate_frac
    for ci in np.flatnonzero(chosen):
        convs[ci]["texts"][0] = bp
    base = convs[0]
    next_id = n_convs
    for _ in range(hot_copies):
        texts = list(base["texts"])
        n_edit = int(rng.integers(1, 3))
        for _e in range(n_edit):
            ti = int(rng.integers(len(texts)))
            words = texts[ti].split(" ")
            words[int(rng.integers(len(words)))] = V[int(rng.integers(VOCAB_SIZE))]
            texts[ti] = " ".join(words)
        convs.append({"conv_id": f"conv-{next_id:08d}", "texts": texts,
                      "roles": list(base["roles"]),
                      "tools": list(base["tools"])})
        next_id += 1
    return convs


def write_skewed_transcripts(out_dir: str, n_convs: int, seed: int = 42,
                             shards: int = 8, hot_copies: int = 300) -> dict:
    """Write the F4 skew fixture (no dup-group ground truth; parity is
    checked pipeline-vs-oracle)."""
    os.makedirs(out_dir, exist_ok=True)
    convs = make_skewed_conversations(n_convs, seed, hot_copies=hot_copies)
    tbl = conversations_to_table(convs, seed + 2)
    n = tbl.num_rows
    bounds = np.linspace(0, n, shards + 1).astype(int)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    for s in range(shards):
        pq.write_table(tbl.slice(bounds[s], bounds[s + 1] - bounds[s]),
                       os.path.join(tdir, f"part-{s:05d}.parquet"))
    return {"rows": n, "convs": len(convs), "dir": tdir}


def write_transcripts(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    with_dups: bool = True,
    shards: int = 8,
) -> dict:
    """Write sharded transcripts parquet (+ dup_groups ground truth).

    Returns manifest info. Partitioned output (one file per shard) so reads
    parallelize and a resumed run can skip finished partitions.
    """
    os.makedirs(out_dir, exist_ok=True)
    convs = generate_conversations(n_convs, seed)
    groups = []
    if with_dups:
        convs, groups = inject_duplicates(convs, seed + 1)
    tbl = conversations_to_table(convs, seed + 2)
    n = tbl.num_rows
    bounds = np.linspace(0, n, shards + 1).astype(int)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    for s in range(shards):
        pq.write_table(tbl.slice(bounds[s], bounds[s + 1] - bounds[s]),
                       os.path.join(tdir, f"part-{s:05d}.parquet"))
    if groups:
        pq.write_table(
            pa.table(
                {
                    "conv_id": [g["conv_id"] for g in groups],
                    "group_id": [g["group_id"] for g in groups],
                    "kind": [g["kind"] for g in groups],
                }
            ),
            os.path.join(out_dir, "dup_groups.parquet"),
        )
    return {"rows": n, "convs": len(convs), "dir": tdir, "groups": len(groups)}
