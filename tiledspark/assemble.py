"""Training-set assembly operators (SURVEY §2 ops 93-95).

The steps DOWNSTREAM of cleaning/dedup/decontamination that turn a kept
corpus into the dataset a trainer actually reads — the last mile the §2E
surface was still missing:

- ``deterministic_sample`` / ``mix_corpora``: weighted mixture sampling with
  epoch upsampling (the GPT-3 table-2.2 / Pile / DoReMi step: each source is
  up- or down-sampled toward target token shares, possibly seen >1 epoch).
- ``deterministic_shuffle``: global pseudo-random training ORDER as one
  range-partitioned sort on a keyed hash — the "shuffle the corpus before
  sharding" step; re-keyable per epoch.
- ``pack_sequences``: greedy first-fit-decreasing packing of tokenized docs
  into fixed-length training sequences (the T5/GPT "example packing" step),
  with long docs chunked and a fill-rate report.

Scale shapes (the design constraints, in order of importance):

* Sampling is a PURE per-row projection — `xxhash64(id, seed)` decides both
  membership and copy count, so epoch N of a 100-TB corpus costs one scan,
  zero shuffles, and is reproducible from (seed, fraction) alone. No RNG
  state, no `sample()` nondeterminism across retries/speculative tasks
  (Spark's `df.sample` re-draws per task attempt; a hash of the row id
  cannot).
* Mixture fractions come from ONE narrow per-domain aggregate (domains are
  few by construction — sources/registers, not documents) broadcast back as
  a literal map; nothing doc-sized moves.
* The shuffle is exactly one range-partitioned sort exchange; the order is
  the total order of (xxhash64(id, seed), id) — deterministic regardless of
  input partitioning, file layout, or cluster size, which is what makes a
  training run reproducible bit-for-bit.
* Packing buckets docs by hash so each `applyInPandas` group holds
  ~``bucket_target_tokens`` tokens (memory-bounded by construction,
  corpus-size-independent); FFD runs per bucket. Packing quality is local
  but measured: the report states the achieved fill rate vs the max_tokens
  capacity — no silent efficiency loss. Bucket count scales with total
  tokens, so 100 TB just means more buckets, never bigger ones.

Public-spec provenance: epoch-weighted source mixing per Brown et al. '20
(GPT-3) §2.2 + Gao et al. '20 (The Pile) §1; temperature-based sampling per
Arivazhagan et al. '19 (multilingual NMT) / XLM-R; sequence packing per
Raffel et al. '20 (T5) §3.1.2 and Kosec et al. '21 (packed BERT). All
re-derived here as Spark-native plans; no reference implementation exists in
the (empty) /root/reference checkout — see SURVEY.md §0.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Hash-bucket resolution for the uniform [0,1) draw. 2^32 buckets: plenty of
# resolution for any realistic sampling fraction, and small enough that the
# modulo stays exact in a double (2^32 < 2^53).
_U_BUCKETS = 2**32


def _uniform01(id_col: Column, seed: int) -> Column:
    """Deterministic per-(id, seed) uniform draw in [0, 1).

    xxhash64 is signed; pmod folds it into [0, 2^32) before the divide so
    the result is an exact dyadic rational — the same doc/seed pair yields
    the same draw on every executor, attempt, and cluster size.
    """
    h = F.xxhash64(id_col, F.lit(int(seed)))
    return F.pmod(h, F.lit(_U_BUCKETS)).cast("double") / F.lit(float(_U_BUCKETS))


def n_copies_expr(id_col: Column, fraction: Column, seed: int = 0) -> Column:
    """Copy count for epoch-weighted sampling: floor(f) guaranteed copies
    plus one Bernoulli(frac(f)) copy decided by the hash draw.

    E[n_copies] = fraction exactly; fraction <= 1 degenerates to plain
    Bernoulli keep/drop, fraction = 2.5 means every doc appears 2 or 3
    times (the "Wikipedia seen 3.4 epochs" pattern from the GPT-3 mixture
    table).
    """
    whole = F.floor(fraction).cast("int")
    rem = fraction - F.floor(fraction)
    return (whole + (_uniform01(id_col, seed) < rem).cast("int")).alias("n_copies")


def deterministic_sample(
    df: DataFrame,
    fraction: float | Column,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible weighted sampling with epoch upsampling (op 93 core).

    Keeps/replicates rows so each appears ``floor(fraction)`` times plus one
    more with probability ``frac(fraction)``, decided by
    ``xxhash64(id, seed)`` — a pure projection (NO shuffle, no RNG state,
    stable under retries and speculative execution, unlike ``df.sample``).
    Output adds ``copy_idx`` (0-based) so downstream shuffling can give the
    repeats independent positions.

    ``fraction`` may be a Column (per-row fractions — how ``mix_corpora``
    applies per-domain rates in one pass).
    """
    frac = F.lit(float(fraction)) if not isinstance(fraction, Column) else fraction
    out = df.withColumn("_nc", n_copies_expr(F.col(id_col), frac, seed=seed))
    out = out.where(F.col("_nc") > 0)
    # explode(sequence) is JVM-native; for the common fraction<=1 case every
    # surviving row gets the single element [0].
    out = out.withColumn(
        "copy_idx", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
    )
    return out.drop("_nc")


def mixture_fractions(
    shares: dict[str, float],
    targets: dict[str, float] | None = None,
    temperature: float | None = None,
    scale: float = 1.0,
) -> dict[str, float]:
    """Per-domain sampling fractions that move observed weight ``shares``
    (domain -> current token count) toward target proportions.

    ``targets`` are relative weights (normalized internally). If omitted,
    ``temperature`` derives them from the data: target_i ∝ share_i^alpha
    (alpha=temperature; alpha<1 flattens toward uniform, the
    multilingual-sampling rule; alpha=0 IS uniform). ``scale`` multiplies
    the total sampled weight relative to the current total (scale=0.5 →
    half-size mixture, 2.0 → two "epochs" worth on average).

    Driver-side pure math over a domains-sized dict (sources, not docs).
    """
    if targets is None:
        if temperature is None:
            raise ValueError("need targets or temperature")
        targets = {d: float(w) ** float(temperature) for d, w in shares.items() if w > 0}
    tot_t = sum(targets.values())
    tot_s = sum(shares.values())
    if tot_t <= 0 or tot_s <= 0:
        return {d: 0.0 for d in shares}
    out = {}
    for d, w in shares.items():
        t = targets.get(d, 0.0) / tot_t
        out[d] = (t * tot_s * float(scale) / w) if w > 0 else 0.0
    return out


def mix_corpora(
    df: DataFrame,
    targets: dict[str, float] | None = None,
    temperature: float | None = None,
    scale: float = 1.0,
    seed: int = 0,
    domain_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Epoch-weighted source mixing (op 93): resample ``df`` so each domain's
    share of total weight approaches the target proportions.

    Plan shape: ONE narrow per-domain aggregate (map-side combined; domains
    are few) collected to a dict, fractions solved driver-side
    (``mixture_fractions``), broadcast back as a literal map, applied as a
    per-row hash draw — one corpus scan, zero doc-sized shuffles, fully
    reproducible from (targets, seed).

    ``weight_col``: column to balance on (token counts for LM mixtures);
    None balances on row counts. Returns (sampled_df, report_df); the report
    has one row per domain: current weight/share, planned fraction, expected
    share — the audit trail for "what mixture did this run actually use".
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    rows = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(w).alias("weight"))
        .collect()
    )
    # NULL-domain rows can't be targeted (and can't key a literal map):
    # they sample at fraction 0 and surface in the report as "__null__"
    null_weight = sum(float(r["weight"]) for r in rows if r["domain"] is None)
    shares = {r["domain"]: float(r["weight"]) for r in rows if r["domain"] is not None}
    fracs = mixture_fractions(shares, targets=targets, temperature=temperature, scale=scale)

    frac_map = F.create_map(
        *[x for d, fr in sorted(fracs.items()) for x in (F.lit(d), F.lit(float(fr)))]
    )
    frac_col = F.coalesce(frac_map[F.col(domain_col)], F.lit(0.0))
    sampled = deterministic_sample(df, frac_col, seed=seed, id_col=id_col)

    tot = sum(shares.values()) + null_weight or 1.0
    exp_tot = sum(shares[d] * fracs[d] for d in shares) or 1.0
    report_rows = [
        (
            d,
            float(shares[d]),
            float(shares[d] / tot),
            float(fracs[d]),
            float(shares[d] * fracs[d] / exp_tot),
        )
        for d in sorted(shares)
    ]
    if null_weight:
        report_rows.append(("__null__", null_weight, null_weight / tot, 0.0, 0.0))
    spark = df.sparkSession
    report = spark.createDataFrame(
        report_rows,
        "domain string, weight double, share double, fraction double, expected_share double",
    )
    return sampled, report


def deterministic_shuffle(
    df: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    extra_key_cols: list[str] | None = None,
) -> DataFrame:
    """Global pseudo-random training order (op 94): ONE range-partitioned
    sort on ``(xxhash64(id, seed, extra...), id, extra...)``.

    The sort key is a total order (id + extras break hash ties), so the
    global row order is a deterministic function of (rows, seed) alone —
    independent of input file layout, partition count, or cluster size.
    That is the property a reproducible training run needs and that
    ``df.orderBy(rand())`` cannot give (rand() re-draws per task attempt).
    Different seeds give statistically independent permutations — re-key
    per epoch. ``extra_key_cols`` joins e.g. ``copy_idx`` into the key so
    upsampled repeats land at independent positions.

    Exactly one exchange (rangepartitioning) + in-partition sort. Written
    parquet files land in order (partition i's file precedes partition
    i+1's and rows are sorted within), so a SEQUENTIAL file-order reader
    recovers the global order — but a Spark re-read does NOT (file splits
    are size-packed); pair with ``with_global_position`` for an explicit,
    layout-proof order key.
    """
    extras = [F.col(c) for c in (extra_key_cols or [])]
    key = F.xxhash64(F.col(id_col), F.lit(int(seed)), *extras)
    out = df.withColumn("_shuffle_key", key)
    sort_cols = [F.col("_shuffle_key"), F.col(id_col), *extras]
    if num_partitions:
        out = out.repartitionByRange(num_partitions, *sort_cols)
    else:
        out = out.repartitionByRange(*sort_cols)
    return out.sortWithinPartitions(*sort_cols).drop("_shuffle_key")


# --- op 95: sequence packing ------------------------------------------------

_PACK_SCHEMA = StructType(
    [
        StructField("seq_id", StringType()),
        StructField("doc_id", LongType()),
        StructField("copy_idx", IntegerType()),
        StructField("part_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("part_tokens", LongType()),
    ]
)


def chunk_parts(
    df: DataFrame,
    max_tokens: int,
    n_tokens_col: str,
    id_col: str,
    copy_col: str | None = None,
) -> DataFrame:
    """Split docs longer than ``max_tokens`` into ceil(n/max) parts (every
    part except possibly the last is exactly max_tokens — the standard
    long-document chunking rule). Pure projection + explode; emits
    (doc_id, copy_idx, part_idx, part_tokens). ``copy_col`` names an
    upsampling copy index (see ``deterministic_sample``) carried through as
    ``copy_idx`` so repeats pack as independent items — arbitrary 64-bit
    doc ids never get folded into a synthetic key."""
    n = F.col(n_tokens_col).cast("long")
    mt = F.lit(int(max_tokens)).cast("long")
    n_parts = F.ceil(n / mt).cast("int")
    copy = F.col(copy_col).cast("int") if copy_col else F.lit(0)
    return (
        df.where(n > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            copy.alias("copy_idx"),
            F.explode(F.sequence(F.lit(0), n_parts - 1)).alias("part_idx"),
            n.alias("_n"),
        )
        .select(
            "doc_id",
            "copy_idx",
            "part_idx",
            F.least(mt, F.col("_n") - F.col("part_idx").cast("long") * mt).alias(
                "part_tokens"
            ),
        )
    )


def _ffd_pack(pdf: pd.DataFrame, max_tokens: int, bucket: int) -> pd.DataFrame:
    """First-fit-decreasing bin packing of one bucket's parts. Deterministic:
    parts sorted by (tokens desc, doc_id, part_idx); numpy linear scan for
    the first bin with room (buckets hold ~thousands of parts, so the
    O(parts × bins) scan is microseconds; bins list stays small)."""
    order = pdf.sort_values(
        ["part_tokens", "doc_id", "copy_idx", "part_idx"],
        ascending=[False, True, True, True],
    )
    free: list[int] = []  # free tokens per bin
    assign = np.empty(len(order), dtype=np.int64)
    offset = np.empty(len(order), dtype=np.int64)
    for i, t in enumerate(order["part_tokens"].to_numpy()):
        placed = -1
        for b, f in enumerate(free):
            if f >= t:
                placed = b
                break
        if placed < 0:
            placed = len(free)
            free.append(max_tokens)
        assign[i] = placed
        offset[i] = max_tokens - free[placed]
        free[placed] -= t
    return pd.DataFrame(
        {
            "seq_id": [f"{bucket}-{b}" for b in assign],
            "doc_id": order["doc_id"].to_numpy(),
            "copy_idx": order["copy_idx"].to_numpy().astype(np.int32),
            "part_idx": order["part_idx"].to_numpy().astype(np.int32),
            "offset": offset,
            "part_tokens": order["part_tokens"].to_numpy(),
        }
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_target_tokens: int = 4_000_000,
    seed: int = 0,
    n_buckets: int | None = None,
    copy_col: str | None = None,
) -> DataFrame:
    """Pack tokenized docs into fixed-capacity training sequences (op 95).

    Docs longer than ``max_tokens`` are chunked first (``chunk_parts``);
    parts are hash-bucketed so each packing group holds
    ~``bucket_target_tokens`` tokens (ONE narrow agg sizes the bucket
    count; groups are memory-bounded by construction and corpus-size-
    INDEPENDENT — 100 TB means more buckets, never bigger ones); FFD packs
    each bucket in an ``applyInPandas`` group. Output: one row per
    (doc part) with its sequence id, token offset inside the sequence, and
    part length.

    Packing is per-bucket rather than global — the price is a slightly
    lower fill rate than global FFD (measured, not silent: see
    ``packing_report``), the payoff is that packing parallelizes
    embarrassingly and never materializes global state.
    """
    parts = chunk_parts(df, max_tokens, n_tokens_col, id_col, copy_col=copy_col)
    if n_buckets is None:
        # one narrow sizing agg; costs an extra scan of the (two-column)
        # chunk projection — pass n_buckets explicitly when the caller
        # already knows the corpus scale to keep packing single-scan
        total = parts.agg(F.sum("part_tokens")).first()[0] or 0
        n_buckets = max(1, math.ceil(total / float(bucket_target_tokens)))
    parts = parts.withColumn(
        "_bucket",
        F.pmod(F.xxhash64("doc_id", "copy_idx", F.lit(int(seed))), F.lit(n_buckets)),
    )

    def pack(key, pdf):
        return _ffd_pack(pdf, int(max_tokens), int(key[0]))

    return parts.groupBy("_bucket").applyInPandas(pack, schema=_PACK_SCHEMA)


def with_global_position(df: DataFrame, pos_col: str = "global_pos") -> DataFrame:
    """Add a dense 0-based global row index that follows the CURRENT
    partition-major row order — the scalable zipWithIndex (op 94 companion:
    after ``deterministic_shuffle``, position = rank in the training order,
    which is what a shard manifest keys on).

    Shape: one tiny counting job (counts per partition, collected —
    O(num_partitions) rows), offsets cumsum'd driver-side and broadcast,
    then ONE order-preserving ``mapInPandas`` pass that stamps positions
    with a running counter. No global window, no single-partition sort, no
    O(N) driver traffic — the two things the naive
    ``row_number() OVER (ORDER BY ...)`` plan would do.

    The input should be deterministic and cheap to recompute (e.g. freshly
    read from parquet, or cached): the count job and the stamping pass are
    two actions over the same lineage.
    """
    tagged = df.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["n"] for r in tagged.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = StructType(tagged.schema.fields[:-1] + [StructField(pos_col, LongType())])
    cols = [f.name for f in tagged.schema.fields[:-1]]

    def stamp(batches):
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[cols].copy()
            out[pos_col] = np.arange(pos, pos + len(pdf), dtype=np.int64)
            pos += len(pdf)
            yield out

    return tagged.mapInPandas(stamp, schema=out_schema)


def with_shard(
    df: DataFrame,
    rows_per_shard: int,
    pos_col: str = "global_pos",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic shard assignment over a positioned frame: shard =
    global_pos // rows_per_shard. All shards full except the last — the
    fixed-size-shard manifest a training reader consumes."""
    return df.withColumn(
        shard_col, (F.col(pos_col) / F.lit(int(rows_per_shard))).cast("long")
    )


def packing_report(assignments: DataFrame, max_tokens: int) -> dict:
    """Fill-rate audit for a ``pack_sequences`` output: sequences, tokens,
    fill_rate = tokens / (n_sequences × max_tokens). One narrow agg."""
    row = assignments.agg(
        F.countDistinct("seq_id").alias("n_sequences"),
        F.sum("part_tokens").alias("total_tokens"),
        F.count("*").alias("n_parts"),
    ).first()
    n_seq = int(row["n_sequences"] or 0)
    tot = int(row["total_tokens"] or 0)
    return {
        "n_sequences": n_seq,
        "total_tokens": tot,
        "n_parts": int(row["n_parts"] or 0),
        "fill_rate": (tot / (n_seq * max_tokens)) if n_seq else 0.0,
    }
