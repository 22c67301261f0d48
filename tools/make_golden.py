"""Generate golden oracle parquets for the hash-based dedup operators.

``dedup_minhash_lsh`` and ``dedup_simhash`` use Spark's xxhash64, which
DuckDB cannot evaluate — so their oracles are golden files produced by
this INDEPENDENT pure-Python reimplementation of the same published
algorithms (MinHash banding LSH, SimHash bit-voting), sharing only the
public XXH64 primitive (tools/pyxxh64.py, itself verified against Spark
in tests/test_golden_oracles.py). No Spark or operator code is imported
here: if the operators' Spark pipelines are wrong, the goldens disagree.

Usage: python tools/make_golden.py   # writes tests/golden/*.parquet
"""

from __future__ import annotations

import itertools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from tools.pyxxh64 import _signed, hash_int, hash_long, xxh64_signed

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")

NUM_HASHES = 32
BANDS = 8
SEED = 42
K_SHINGLE = 3
VERIFY_THRESHOLD = 0.4
MAX_HAMMING = 6
_M = 0xFFFFFFFFFFFFFFFF


def toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def shingles(text: str, k: int = K_SHINGLE) -> list[str]:
    t = toks(text)
    if len(t) >= k:
        out, seen = [], set()
        for i in range(len(t) - k + 1):
            s = " ".join(t[i:i + k])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(t)]


def sig_hash(h_base: int, j: int) -> int:
    """Replicates Spark ``F.xxhash64(hashCol, F.lit(SEED + j))`` on a
    LONG column: chained child hashing from the default seed 42 —
    hash_long(h, 42) then hash_int(SEED+j, ·)."""
    return _signed(hash_int(SEED + j, hash_long(h_base, 42)))


def _sigs_and_sets(
    docs: pd.DataFrame,
) -> tuple[dict[int, tuple[int, ...]], dict[int, frozenset[int]]]:
    """Minhash signatures + hashed shingle sets, derived ONCE per corpus
    (minhash/clusters/incremental goldens all consume the same pair)."""
    sigs: dict[int, tuple[int, ...]] = {}
    sets: dict[int, frozenset[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        base = [xxh64_signed(s, 42) for s in shingles(text)]
        sets[doc_id] = frozenset(base)
        sigs[doc_id] = tuple(
            min(sig_hash(h, j) for h in base) for j in range(NUM_HASHES)
        )
    return sigs, sets


def minhash_lsh_golden(docs: pd.DataFrame) -> pd.DataFrame:
    rows_per_band = NUM_HASHES // BANDS
    sigs, sets = _sigs_and_sets(docs)

    candidates: set[tuple[int, int]] = set()
    for b in range(BANDS):
        buckets: dict[tuple[int, ...], list[int]] = {}
        for doc_id, sig in sigs.items():
            key = sig[b * rows_per_band:(b + 1) * rows_per_band]
            buckets.setdefault(key, []).append(doc_id)
        for ids in buckets.values():
            for x, y in itertools.combinations(sorted(ids), 2):
                candidates.add((x, y))

    out = []
    for x, y in sorted(candidates):
        inter = len(sets[x] & sets[y])
        union = len(sets[x] | sets[y])
        jac = inter / union if union else 0.0
        if jac >= VERIFY_THRESHOLD:
            out.append((x, y, round(jac, 6)))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
    )


def incremental_golden(docs: pd.DataFrame, split_frac: float = 0.8) -> pd.DataFrame:
    """Cross-corpus (new batch vs existing corpus) minhash-LSH pairs:
    corpus = doc_id < split, new = doc_id >= split (split at
    ``split_frac`` of the doc count — ids are contiguous from 0).
    Independent union of the same published algorithm: band-bucket
    collisions BETWEEN the two sides, verified with exact Jaccard."""
    split = int(len(docs) * split_frac)
    rows_per_band = NUM_HASHES // BANDS
    sigs, sets = _sigs_and_sets(docs)

    candidates: set[tuple[int, int]] = set()
    for b in range(BANDS):
        buckets: dict[tuple[int, ...], tuple[list[int], list[int]]] = {}
        for doc_id, sig in sigs.items():
            key = sig[b * rows_per_band:(b + 1) * rows_per_band]
            side = buckets.setdefault(key, ([], []))
            side[0 if doc_id < split else 1].append(doc_id)
        for old_ids, new_ids in buckets.values():
            for n in new_ids:
                for o in old_ids:
                    candidates.add((n, o))

    out = []
    for n, o in sorted(candidates):
        inter = len(sets[n] & sets[o])
        union = len(sets[n] | sets[o])
        jac = inter / union if union else 0.0
        if jac >= VERIFY_THRESHOLD:
            out.append((n, o, round(jac, 6)))
    return pd.DataFrame(out, columns=["new_id", "corpus_id", "jaccard"]).astype(
        {"new_id": "int64", "corpus_id": "int64", "jaccard": "float64"}
    )


def clusters_golden(docs: pd.DataFrame) -> pd.DataFrame:
    """Duplicate clusters = connected components (min reachable id) over
    the minhash-LSH pair graph, via plain union-find — an independent
    replay of dedup.duplicate_clusters' fixpoint over the same pair
    source the driver query uses."""
    pairs = minhash_lsh_golden(docs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = sorted((v, find(v)) for v in parent)
    return pd.DataFrame(out, columns=["doc_id", "cluster_id"]).astype(
        {"doc_id": "int64", "cluster_id": "int64"}
    )


def simhash64(text: str) -> int:
    votes = [0] * 64
    for t in toks(text):
        h = xxh64_signed(t, 42)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    u = 0
    for i in range(64):
        if votes[i] > 0:
            u |= 1 << i
    return u - (1 << 64) if u >= (1 << 63) else u


def simhash_golden(docs: pd.DataFrame) -> pd.DataFrame:
    sh = {d: simhash64(t) for d, t in zip(docs["doc_id"], docs["text"])}
    blocks: dict[int, list[int]] = {}
    for doc_id, h in sh.items():
        blocks.setdefault((h & _M) >> 48, []).append(doc_id)
    out = []
    for ids in blocks.values():
        for x, y in itertools.combinations(sorted(ids), 2):
            ham = bin((sh[x] ^ sh[y]) & _M).count("1")
            if ham <= MAX_HAMMING:
                out.append((x, y, ham))
    out.sort()
    return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"]).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
    )


BPE_VOCAB_SIZE = 512
BPE_MIN_PAIR = 2
BPE_MAX_WORDS = 65536
# ASCII stand-in for the operator's Java-regex \p{L}/\p{N} classes —
# exact only on ASCII corpora, which bpe_golden asserts below.
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")


def bpe_golden(docs: pd.DataFrame) -> pd.DataFrame:
    """Naive-but-obvious BPE: full pair recount per merge, leftmost
    min-rank greedy encode — structurally different from the operator's
    incremental trainer so a shared bug cannot hide."""
    for t in docs["text"]:
        assert t.isascii(), "bpe golden requires an ASCII corpus"
    counts: dict[str, int] = {}
    for t in docs["text"]:
        for w in _BPE_RE.findall(t):
            counts[w] = counts.get(w, 0) + 1
    table = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_MAX_WORDS]
    syms = [tuple(w.encode("utf-8")) for w, _ in table]
    freqs = [n for _, n in table]
    merges: list[tuple[int, int]] = []
    while 256 + len(merges) < BPE_VOCAB_SIZE:
        pc: dict[tuple[int, int], int] = {}
        for sym, f in zip(syms, freqs):
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        if pc[best] < BPE_MIN_PAIR:
            break
        nid = 256 + len(merges)
        merges.append(best)
        for i, sym in enumerate(syms):
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                    out.append(nid)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            syms[i] = tuple(out)
    ranks = {p: r for r, p in enumerate(merges)}

    def enc(word: str) -> list[int]:
        sym = list(word.encode("utf-8"))
        while len(sym) > 1:
            cand = [(ranks[(a, b)], i) for i, (a, b) in enumerate(zip(sym, sym[1:]))
                    if (a, b) in ranks]
            if not cand:
                break
            r, i = min(cand)
            sym[i:i + 2] = [256 + r]
        return sym

    cache: dict[str, list[int]] = {}
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        ids: list[int] = []
        for w in _BPE_RE.findall(t):
            if w not in cache:
                cache[w] = enc(w)
            ids.extend(cache[w])
        acc = 0
        for x in ids:
            acc = (acc * 1000003 + x) % 2147483647
        rows.append((d, len(ids), acc))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "tok_hash"]).astype(
        {"doc_id": "int64", "n_tokens": "int32", "tok_hash": "int64"}
    )


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in ("0.001", "0.01"):
        docs = pd.read_parquet(f"/root/testdata/sf{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        mh = minhash_lsh_golden(docs)
        sim = simhash_golden(docs)
        cl = clusters_golden(docs)
        inc = incremental_golden(docs)
        mh.to_parquet(os.path.join(GOLDEN_DIR, f"dedup_minhash_lsh.sf{sf}.parquet"),
                      index=False)
        sim.to_parquet(os.path.join(GOLDEN_DIR, f"dedup_simhash.sf{sf}.parquet"),
                       index=False)
        cl.to_parquet(os.path.join(GOLDEN_DIR, f"dedup_clusters.sf{sf}.parquet"),
                      index=False)
        inc.to_parquet(os.path.join(GOLDEN_DIR, f"dedup_incremental.sf{sf}.parquet"),
                       index=False)
        bp = bpe_golden(docs)
        bp.to_parquet(os.path.join(GOLDEN_DIR, f"bpe.sf{sf}.parquet"),
                      index=False)
        print(f"sf{sf}: minhash_lsh={len(mh)} pairs, simhash={len(sim)} pairs, "
              f"clusters={len(cl)} docs, incremental={len(inc)} pairs, "
              f"bpe={len(bp)} docs")


if __name__ == "__main__":
    main()
