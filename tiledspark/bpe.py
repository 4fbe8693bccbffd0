"""Trained byte-pair-encoding vocabulary + corpus tokenization (SURVEY §2
op 97).

The §2E token-counting surface so far carries the GPT-2 pre-tokenizer CLASS
count (`n_tokens_bpe`, a regexp — op 78); real pipelines TRAIN the subword
vocabulary on the corpus (Sennrich et al. '16; GPT-2's BPE per Radford et
al. '19). This module does both halves with the op-88 asymmetry:

* WORD COUNTS are distributed: one corpus scan → (word, count) aggregate,
  capped to the top ``max_word_types`` types by a distributed TakeOrdered
  (never a global sort — the surprisal convention), with the captured count
  mass reported (no silent cap).
* MERGE LEARNING is driver-side on the word-frequency table — vocab-sized
  (10^4-10^5 types), not corpus-sized, which is exactly how the published
  trainers work (HuggingFace/subword-nmt train from word counts). The
  learner keeps an inverted pair→words index so each merge touches only the
  words containing it (incremental recount, not a full rescan), and breaks
  count ties lexicographically so training is DETERMINISTIC.
* ENCODING is corpus-wide: an Arrow-batched pandas UDF applying the ranked
  merges greedily (the GPT-2 ``bpe()`` loop) with a per-word cache — Zipf
  means the cache hit rate is the corpus's type/token ratio, so the hot
  path is a dict lookup per word, not a merge loop per token.

No reference implementation exists (empty /root/reference checkout —
SURVEY.md §0); algorithm re-derived from the published descriptions.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

END = "</w>"  # end-of-word marker (Sennrich '16 convention)


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_types: int = 50_000,
    lowercase: bool = True,
) -> tuple[list[tuple[str, int]], dict]:
    """Distributed (word, count) table capped to the top ``max_word_types``
    types: explode → map-side-combined groupBy → distributed TakeOrdered
    (count desc, word asc — total order, deterministic). Returns the pairs
    plus a report {n_word_types, kept_types, count_mass_kept} so the cap is
    never silent."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = (
        df.select(F.explode(F.split(t, r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    words = words.cache()
    totals = words.agg(
        F.count("*").alias("types"), F.sum("n").alias("mass")
    ).first()
    # orderBy+limit plans as TakeOrderedAndProject: map-side top-N per
    # partition, never a global sort (the op-88 vocab-cap convention)
    top = (
        words.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_word_types)
        .collect()
    )
    words.unpersist()
    kept = [(r["w"], int(r["n"])) for r in top]
    kept_mass = sum(n for _, n in kept)
    report = {
        "n_word_types": int(totals["types"] or 0),
        "kept_types": len(kept),
        "count_mass_kept": (kept_mass / float(totals["mass"])) if totals["mass"] else 0.0,
    }
    return kept, report


def learn_bpe(counts: list[tuple[str, int]], n_merges: int = 1000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) table.

    Classic Sennrich '16 with the incremental-index optimization: an
    inverted pair→{word_idx} map means each merge re-examines only the
    words that contain the merged pair. Ties on pair count break
    lexicographically — training is a pure function of the counts."""
    words = [list(w) + [END] for w, _ in counts]
    freqs = [int(n) for _, n in counts]

    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += freqs[i]
            where[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in sorted(where[best]):
            syms = words[i]
            f = freqs[i]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                where[(a, b)].discard(i)
            # apply the merge left-to-right
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # add back the new contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                where[(a, b)].add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy GPT-2-style encode: repeatedly merge the lowest-ranked pair
    present until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b), 1 << 60), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        rank, _ = min(pairs)
        if rank >= 1 << 60:
            break
        out = []
        j = 0
        # merge ALL occurrences of the chosen pair this round (standard bpe())
        target = None
        for r, i in pairs:
            if r == rank:
                target = (syms[i], syms[i + 1])
                break
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == target:
                out.append(syms[j] + syms[j + 1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    max_word_types: int = 50_000,
    lowercase: bool = True,
) -> dict:
    """End-to-end trainer: distributed capped word counts → driver-side
    merge learning. Returns {"merges": [[a, b], ...], "report": {...}} —
    JSON-serializable, engine-independent."""
    counts, report = word_counts(
        df, text_col=text_col, max_word_types=max_word_types, lowercase=lowercase
    )
    merges = learn_bpe(counts, n_merges=n_merges)
    return {"merges": [list(m) for m in merges], "report": report}


# Worker-scope encode caches, keyed by model fingerprint (round 9 — the
# round-8 review's per-batch-cache finding): the per-word memo previously
# lived inside _encode_series, so the Zipf cache reset every Arrow batch
# (~10k rows) and the claimed one-dict-lookup-per-token hot path only
# amortized within a batch. Module scope survives across batches AND across
# tasks in a reused Python worker (guide §4.5: tiledspark.bpe is an
# importable module on the executors, so the pickled closure references this
# global by module, not by value). Keyed by a driver-computed digest of the
# merge table — two different models never share entries — and bounded:
# past _ENCODE_CACHE_MAX word types the cache is cleared (deterministic,
# results unaffected; only the memo resets).
_ENCODE_CACHES: dict[str, dict[str, list[str]]] = {}
_ENCODE_CACHE_MAX = 1 << 20


def bpe_encode_udf(model: dict, lowercase: bool = True, count_only: bool = False):
    """Arrow-batched pandas UDF encoding whole documents with the trained
    merges. Per-word dict cache at WORKER scope (see _ENCODE_CACHES): Zipf
    makes the hot path one lookup per token, amortized across every batch
    and task the worker runs. ``count_only`` returns int token counts (the
    training-budget accounting column); otherwise the full token array."""
    import hashlib

    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    model_key = hashlib.sha1(
        ("L" if lowercase else "C").encode()
        + "\x00".join(
            f"{a}\x01{b}" for a, b in (tuple(m) for m in model["merges"])
        ).encode()
    ).hexdigest()

    # no param annotation: Spark 4 infers eval type from hints when any are
    # present and then requires a return hint; bare signature + explicit
    # returnType is the stable spelling
    def _encode_series(s):
        cache = _ENCODE_CACHES.setdefault(model_key, {})
        if len(cache) > _ENCODE_CACHE_MAX:
            cache.clear()
        counts_out = []
        toks_out = []
        for text in s:
            if text is None:
                counts_out.append(0)
                toks_out.append([])
                continue
            if lowercase:
                text = text.lower()
            toks: list[str] = []
            n = 0
            for w in text.split():
                enc = cache.get(w)
                if enc is None:
                    enc = encode_word(w, ranks)
                    cache[w] = enc
                n += len(enc)
                if not count_only:
                    toks.extend(enc)
            counts_out.append(n)
            toks_out.append(toks)
        return pd.Series(counts_out if count_only else toks_out)

    if count_only:
        return F.pandas_udf(_encode_series, IntegerType())
    return F.pandas_udf(_encode_series, ArrayType(StringType()))
