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
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
EPOCH_US = 1_700_000_000_000_000  # fixed base, no wall-clock reads

_VOCAB = None


def vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)
    return _VOCAB


def _zipf_tokens(rng: np.random.Generator, n: int) -> np.ndarray:
    """Zipf-distributed token ids clipped to the vocabulary."""
    z = rng.zipf(1.3, size=int(n * 1.05) + 16)
    z = z[z <= VOCAB_SIZE][:n]
    while len(z) < n:
        extra = rng.zipf(1.3, size=n)
        z = np.concatenate([z, extra[extra <= VOCAB_SIZE]])[:n]
    return (z - 1).astype(np.int64)


def generate_conversations(n_convs: int, seed: int = 42) -> list[dict]:
    """List of conv dicts: {conv_id, turns: [text...], roles, tools}."""
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

    convs = []
    t_off = 0
    tok_off = 0
    for ci in range(n_convs):
        nt = int(n_turns[ci])
        texts, roles, tools = [], [], []
        for ti in range(nt):
            ntk = int(toks_per_turn[t_off])
            ids = token_ids[tok_off : tok_off + ntk]
            texts.append(" ".join(V[ids]))
            if ti % 2 == 0:
                roles.append("user")
                tools.append("")
            else:
                # ~10% of assistant turns are followed by a tool turn; we
                # model the tool turn as the role itself for simplicity
                if tool_draw[t_off] < 0.1:
                    roles.append("tool")
                    tools.append(tool_names[tool_kind[t_off]])
                else:
                    roles.append("assistant")
                    tools.append("")
            t_off += 1
            tok_off += ntk
        convs.append(
            {"conv_id": f"conv-{ci:08d}", "texts": texts, "roles": roles, "tools": tools}
        )
    return convs


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
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci, c in enumerate(convs):
        for ti, (t, r, tl) in enumerate(zip(c["texts"], c["roles"], c["tools"])):
            conv_ids.append(c["conv_id"])
            turn_idxs.append(ti)
            roles.append(r)
            texts.append(t)
            tools.append(tl)
            tss.append(EPOCH_US + ci * 3_600_000_000 + ti * 30_000_000)
    n = len(conv_ids)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    tbl = pa.table(
        {
            "conv_id": pa.array(np.array(conv_ids, dtype=object)[perm], type=pa.string()),
            "turn_idx": pa.array(np.array(turn_idxs, dtype=np.int32)[perm], type=pa.int32()),
            "role": pa.array(np.array(roles, dtype=object)[perm], type=pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(np.array(tools, dtype=object)[perm], type=pa.string()),
            "ts": pa.array(np.array(tss, dtype=np.int64)[perm], type=pa.timestamp("us")),
        }
    )
    return tbl


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
