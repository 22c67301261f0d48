"""Byte-pair-encoding tokenizer: distributed trainer + Arrow encoder.

The published BPE trainer architecture (Sennrich et al. 2016,
arXiv:1508.07909; GPT-2's byte-level variant) splits cleanly along
Spark's execution model:

* **corpus-sized work is distributed** — pre-tokenize every document
  with the GPT-2-style regex (:data:`text._BPE_SPLIT`, evaluated
  JVM-side) and count distinct pre-tokens: ONE hash-groupBy, the only
  shuffle in the fit;
* **the merge loop runs driver-side over the bounded word table** —
  its input is (word, count) rows capped at ``max_words`` (ties broken
  by word for determinism), so loop cost is bounded by the CAP, not the
  corpus. This is exactly how the reference trainers scale: 100 TB of
  text still produces a word-frequency table that fits in memory once
  hapax-pruned/capped.

Encoding broadcasts the fitted merge ranks and applies the classic
rank-greedy loop per DISTINCT word inside an Arrow batch (word-level
cache), over pre-tokens split JVM-side — the Java regex stays the single
authority on token boundaries, so Spark and the encoder can never
disagree on splitting.

Token-id space: byte ``b`` -> id ``b`` (0..255); the rank-``r`` merge
creates id ``256 + r``. Words are processed as their UTF-8 bytes, so any
string tokenizes losslessly (GPT-2's byte-level property).

Reference analog: none — engine addition for the LLM-data pipeline
(exact tokenization; :func:`text.bpe_token_estimate` stays the cheap
serving approximation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text

# stop merging when the best pair occurs fewer times than this
MIN_PAIR_COUNT = 2


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over GPT-2-style pre-tokens — one explode + hash-groupBy.

    The regex pre-tokenize is the compute; widen below the explode so a
    one-split parquet doesn't serialize it on one core (no-op at real
    scale — see similarity._widen_scan)."""
    from .similarity import _widen_scan

    return (
        _widen_scan(df.select(text_col))
        .select(
            F.explode(text.bpe_regex_tokens(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train_from_counts(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 512,
    min_pair_count: int = MIN_PAIR_COUNT,
) -> list[tuple[int, int]]:
    """Classic BPE merge loop over a (word, count) table.

    Deterministic: the best pair is max by (total count, then SMALLEST
    (id_a, id_b) tuple); stops at ``vocab_size`` total ids or when no
    pair reaches ``min_pair_count``. Incremental pair-count maintenance
    (only words containing the merged pair are touched) keeps the loop
    ~O(merges x affected-words), not O(merges x table)."""
    words = [tuple(w.encode("utf-8")) for w, _ in word_counts]
    freqs = [int(n) for _, n in word_counts]

    pair_counts: dict[tuple[int, int], int] = {}
    pair_words: dict[tuple[int, int], set[int]] = {}

    def add_word(wi: int, sym: tuple[int, ...], sign: int) -> None:
        f = freqs[wi] * sign
        for a, b in zip(sym, sym[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi, sym in enumerate(words):
        add_word(wi, sym, +1)

    merges: list[tuple[int, int]] = []
    next_id = 256
    while next_id < vocab_size:
        best, best_n = None, 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < min_pair_count:
            break
        merges.append(best)
        for wi in sorted(pair_words.get(best, ())):
            sym = words[wi]
            add_word(wi, sym, -1)
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = tuple(out)
            add_word(wi, words[wi], +1)
        # drop exhausted entries so the scan stays ∝ live pairs
        for p in [p for p, n in pair_counts.items() if n <= 0]:
            del pair_counts[p]
            pair_words.pop(p, None)
        next_id += 1
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 65536,
    min_pair_count: int = MIN_PAIR_COUNT,
) -> list[tuple[int, int]]:
    """Fit BPE merges on a corpus: distributed word count, bounded
    collect (top ``max_words`` by count, ties by word — a top-k at any
    scale), driver merge loop."""
    rows = (
        bpe_word_counts(df, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return bpe_train_from_counts(
        [(r["word"], r["n"]) for r in rows], vocab_size, min_pair_count
    )


def bpe_vocab(merges: list[tuple[int, int]]) -> dict[int, bytes]:
    """id -> byte-sequence table for the fitted merge list."""
    vocab = {i: bytes([i]) for i in range(256)}
    for r, (a, b) in enumerate(merges):
        vocab[256 + r] = vocab[a] + vocab[b]
    return vocab


def encode_word(sym: tuple[int, ...], ranks: dict[tuple[int, int], int]):
    """Rank-greedy BPE encode of one symbol sequence (GPT-2's loop):
    repeatedly merge the lowest-rank adjacent pair until none applies."""
    sym = list(sym)
    while len(sym) > 1:
        best_r, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [256 + best_r]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, int]],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col: array<int>`` — exact BPE token ids under the
    fitted merges. Pre-tokens are split JVM-side (the Java regex is the
    only splitter); the Arrow UDF applies merges per DISTINCT pre-token
    with a batch-level cache, so cost ∝ distinct words per batch, not
    total tokens."""
    from pyspark.sql.types import ArrayType, IntegerType

    ranks = {p: r for r, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode_tokens(tok_lists):
        cache: dict[str, list[int]] = {}
        out = []
        for toks in tok_lists:
            if toks is None:
                out.append(None)
                continue
            ids: list[int] = []
            for w in toks:
                got = cache.get(w)
                if got is None:
                    got = encode_word(tuple(w.encode("utf-8")), ranks)
                    cache[w] = got
                ids.extend(got)
            out.append(ids)
        import pandas as pd

        return pd.Series(out)

    from .similarity import _widen_scan

    # the Arrow encode UDF is the compute — widen so a one-split scan
    # doesn't run it on one core (no-op at real scale)
    return _widen_scan(df).withColumn(
        out_col, encode_tokens(text.bpe_regex_tokens(F.col(text_col)))
    )


def bpe_decode(
    df: DataFrame,
    merges: list[tuple[int, int]],
    ids_col: str = "token_ids",
    out_col: str = "text",
) -> DataFrame:
    """Append ``out_col: string`` — the inverse of :func:`bpe_encode`:
    each id maps to its byte sequence under the fitted merges,
    sequences concatenate, bytes decode as UTF-8. Token BYTES are
    lossless; the repo's RE2∩Java pre-tokenizer, however, collapses
    whitespace RUNS (tabs/newlines/double spaces) rather than
    partitioning the string, so decode(encode(x)) == x byte-for-byte
    exactly when x's separators are single ASCII spaces, and for any x
    one encode/decode pass is a FIXED POINT:
    decode(encode(decode(encode(x)))) == decode(encode(x)).

    The id->bytes table is bounded by vocab_size and lives in the Arrow
    UDF closure (same shape as the encoder); NULL id arrays decode to
    NULL, unknown ids raise (a wrong-tokenizer artifact must fail loud,
    not produce silently corrupt text)."""
    from pyspark.sql.types import StringType

    vocab = bpe_vocab(merges)

    @F.pandas_udf(StringType())
    def decode_ids(id_lists):
        import pandas as pd

        out = []
        for ids in id_lists:
            if ids is None:
                out.append(None)
                continue
            out.append(b"".join(vocab[int(i)] for i in ids).decode("utf-8"))
        return pd.Series(out)

    return df.withColumn(out_col, decode_ids(F.col(ids_col)))


def save_merges(path: str, merges: list[tuple[int, int]]) -> None:
    """Persist a fitted tokenizer as a JSON artifact (the merge list IS
    the tokenizer — ranks are positions, ids reconstruct from rank)."""
    import json

    with open(path, "w") as f:
        json.dump({"version": 1, "vocab_size": 256 + len(merges),
                   "merges": [list(p) for p in merges]}, f)


def load_merges(path: str) -> list[tuple[int, int]]:
    import json

    with open(path) as f:
        art = json.load(f)
    if art.get("version") != 1:
        raise ValueError(f"unknown bpe artifact version {art.get('version')!r}")
    return [(int(a), int(b)) for a, b in art["merges"]]


def token_fold_hash(ids: Column) -> Column:
    """Order-sensitive polynomial fold of a token-id array, exact on
    both engines: acc = (acc * 1000003 + id) mod 2147483647 — every
    intermediate fits a BIGINT, so no overflow semantics leak in."""
    return F.aggregate(
        ids,
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(
            acc * F.lit(1000003) + x.cast("bigint"), F.lit(2147483647)
        ),
    )
