"""End-to-end `spark-submit --py-files` packaging test (north_star: "The
whole pipeline runs via spark-submit --py-files"; SURVEY.md §7 M8).

The job process gets NO repo on its import path — `tiledspark` must arrive
exclusively through the --py-files zip, exactly as it would on a cluster.
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> None:
    """Same content rule as `make pyfiles` (zip -qr ... -x __pycache__)."""
    pkg = os.path.join(REPO, "tiledspark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(tmp_path, pages_path, zones_path, spark):
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)
    store_root = str(tmp_path / "store")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "build_tiles.py"),
            "--pages", pages_path,
            "--zones", zones_path,
            "--store", store_root,
            "--n-buckets", "8",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["tree_snapshot"] > 0 and result["join_snapshot"] > 0

    # the committed artifacts are readable back and non-trivial
    from tiledspark.snapshot import SnapshotStore

    store = SnapshotStore(store_root)
    assert store.find_tag("tile_tree") == result["tree_snapshot"]
    tree = store.read(spark, result["tree_snapshot"])
    assert tree.where(F.col("state") == "materialized").count() > 0
    joined = store.read(spark, result["join_snapshot"])
    assert joined.count() > 0
    # resumable per-zoom snapshots all present
    assert all(store.find_tag(f"tile_counts_zoom={z}") for z in result["zoom_snapshots"])


def test_spark_submit_stream_diffs_job(tmp_path, pages_path, spark):
    """jobs/stream_diffs.py end-to-end via spark-submit --py-files: diffs
    stream onto an existing store as copy-on-write layers; a rerun from the
    same checkpoint commits nothing new (exactly-once layering)."""
    from tiledspark import synth, tiles
    from tiledspark.extract import dedupe_latest_by_url, extract_coords
    from tiledspark.snapshot import SnapshotStore

    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)
    store_root = str(tmp_path / "store")

    # seed the base snapshot the diff layers apply onto
    store = SnapshotStore(store_root, n_buckets=256)
    base = (
        dedupe_latest_by_url(extract_coords(spark.read.parquet(pages_path)))
        .where(F.col("lat").isNotNull())
        .withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE))
        .select("url", "warc_ts", "text", "lang", "lat", "lon", "tile_id")
    )
    store.commit(base, key_col="tile_id", index_key="url")

    diffs_dir = os.path.dirname(
        synth.ensure_diff_batches(str(tmp_path), 5_000, n_batches=2, rows=60)[0]
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def run():
        return subprocess.run(
            [
                "spark-submit", "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "stream_diffs.py"),
                "--diffs", diffs_dir,
                "--store", store_root,
                "--checkpoint", str(tmp_path / "ckpt"),
                "--n-buckets", "256",
            ],
            cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
        )

    out = run()
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(res["committed_snapshots"]) == 2, res
    assert res["n_snapshots"] == 3  # base + 2 layers
    # layers are copy-on-write, not full rewrites
    m = store.manifest(res["latest"])
    assert m["diff"]["n_carried_files"] > 0

    # replay from the same checkpoint: nothing new
    out2 = run()
    assert out2.returncode == 0, out2.stderr[-2000:]
    res2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert res2["n_snapshots"] == 3 and res2["committed_snapshots"] == []


def test_spark_submit_dedup_corpus(tmp_path, spark):
    """The training-data dedup sweep as a cluster job: exact stratum, LSH
    near-dup pairs, transitive connected-component keeper selection — all
    through the --py-files zip with no repo on the job's import path."""
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight").split()
    texts = {}
    # 40 distinct filler docs
    for i in range(40):
        texts[i] = " ".join(f"w{i}_{j}" for j in range(30))
    texts[100] = " ".join(base)
    texts[101] = " ".join(base)                       # exact dup of 100
    mut1 = list(base); mut1[3] = "cat"
    texts[102] = " ".join(mut1)                       # near dup of 100
    mut2 = list(mut1); mut2[15] = "slowly"
    texts[103] = " ".join(mut2)                       # near dup of 102 (chain)
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())], "doc_id long, text string"
    ).write.parquet(docs_path)

    out_path = str(tmp_path / "deduped.parquet")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "dedup_corpus.py"),
            "--docs", docs_path,
            "--out", out_path,
            "--min-jaccard", "0.5",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] == 44
    assert stats["n_exact_dropped"] == 1          # 101
    # 100~102~103 is one transitive component -> keeper 100 only
    assert stats["n_near_dropped"] == 2 and stats["n_components"] == 1
    assert stats["n_kept"] == 41
    kept = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert 100 in kept and not {101, 102, 103} & kept
    assert len(kept) == 41


def test_spark_submit_dedup_corpus_with_boilerplate_stage(tmp_path, spark):
    """--boilerplate-max-df: line-level boilerplate removal runs BEFORE
    similarity, so a doc that differs from another only by a boilerplate
    line dedupes EXACTLY after cleaning (raw md5 would have missed it),
    and the original text column rides through unmutated."""
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest tonight").split()
    boiler = "JOIN OUR MAILING LIST"
    texts = {}
    for i in range(40):
        t = " ".join(f"w{i}_{j}" for j in range(30))
        texts[i] = t + "\n" + boiler if i < 30 else t   # df(boiler) grows to 31
    texts[100] = " ".join(base)
    texts[101] = " ".join(base)                         # exact dup of 100
    mut1 = list(base); mut1[3] = "cat"
    texts[102] = " ".join(mut1)                         # near dup of 100
    mut2 = list(mut1); mut2[15] = "slowly"
    texts[103] = " ".join(mut2)                         # near dup of 102 (chain)
    texts[104] = " ".join(base) + "\n" + boiler         # dup of 100 ONLY after cleaning
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())], "doc_id long, text string"
    ).write.parquet(docs_path)

    out_path = str(tmp_path / "deduped.parquet")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "dedup_corpus.py"),
            "--docs", docs_path,
            "--out", out_path,
            "--min-jaccard", "0.5",
            "--boilerplate-max-df", "10",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] == 45
    assert stats["n_boiler_lines_dropped"] == 31
    assert stats["n_exact_dropped"] == 2            # 101 raw + 104 post-clean
    assert stats["n_near_dropped"] == 2 and stats["n_components"] == 1
    assert stats["n_kept"] == 41
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_path).collect()}
    assert 100 in rows and not {101, 102, 103, 104} & set(rows)
    # byte-identity invariant: original text survives untouched on a doc
    # whose boilerplate line was stripped from text_clean only
    assert rows[0]["text"].endswith(boiler)
    assert not rows[0]["text_clean"].endswith(boiler)


def test_spark_submit_prepare_corpus(tmp_path, spark):
    """The FULL training-corpus preparation pipeline as one cluster job:
    quality+language gate -> exact dedup -> LSH near-dup components ->
    hashed-TF embedding + SQ8 codes — every stage exercised by a planted
    doc, all through the --py-files zip."""
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)

    base = ("the quick brown fox jumps over the lazy dog and then it runs "
            "far away into the deep green forest tonight").split()
    texts = {}
    # 30 good English docs (stopwords present -> lang=en, stop_ratio > 0)
    for i in range(30):
        texts[i] = "the fox is in w%d_a and it runs to of w%d_b that w%d_c" % (i, i, i)
    texts[0] += " mail bob@example.com now"   # PII planted in a surviving doc
    rep_line = "the fox is in the den w300"
    texts[300] = "\n".join([rep_line] * 3)     # dup-line frac 1.0 -> rejected
    texts[200] = "too short"                       # < 5 tokens
    texts[201] = "the fox is carrying " + "x" * 120  # 120-char token
    texts[202] = ("der hund ist nicht ein das und zu der die und das ist "
                  "nicht ein zu haus")             # de -> rejected by --langs en
    texts[100] = " ".join(base)
    texts[101] = " ".join(base)                    # exact dup of 100
    mut = list(base); mut[3] = "cat"
    texts[102] = " ".join(mut)                     # near dup of 100
    # SEMANTIC dup of 100 (round 8): same token multiset, reversed order —
    # char-shingle Jaccard ~0 (survives MinHash) but hashed-TF cosine = 1.0
    texts[103] = " ".join(reversed(base))
    # CONTAMINATED doc (round 8): embeds 9 consecutive tokens of an eval
    # example (>= one 8-gram) with case noise; passes every quality screen
    # and is no near-dup of anything — only stage 1d can catch it
    eval_text = "what is the capital of france and when was it founded"
    texts[400] = ("the fox is pondering " +
                  " ".join(eval_text.split()[:9]).upper() + " w400 tail")
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())], "doc_id long, text string"
    ).write.parquet(docs_path)
    eval_path = str(tmp_path / "evalset.parquet")
    spark.createDataFrame(
        [(0, eval_text), (1, "unrelated benchmark prompt about tides and the moon cycle")],
        "eval_id long, text string",
    ).write.parquet(eval_path)

    out_path = str(tmp_path / "prepared.parquet")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "prepare_corpus.py"),
            "--docs", docs_path,
            "--out", out_path,
            "--langs", "en",
            "--min-tokens", "5",
            "--max-token-len", "80",
            "--min-jaccard", "0.5",
            "--emb-dim", "32",
            "--scrub-pii",
            "--max-dup-line-frac", "0.9",
            # non-binding band: exercises the surprisal stage wiring without
            # changing outcomes (the band test itself is library-level)
            "--min-mean-surprisal", "0.0",
            "--max-mean-surprisal", "1e9",
            "--semdedup-min-cos", "0.95",
            "--decontam-eval", eval_path,
            "--decontam-ngram", "8",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] == 39
    rej = stats["quality_rejected"]
    assert rej["too_few_tokens"] == 1          # 200
    assert rej["max_token_too_long"] == 1      # 201
    assert rej["lang_rejected"] == 1           # 202
    assert stats["n_after_quality"] == 36      # incl. repetitive 300 + contaminated 400
    assert stats["repetition_rejected"] == {"dup_line": 1, "top_bigram": 0}
    assert stats["surprisal_rejected"] == {"too_low": 0, "too_high": 0}
    assert stats["n_decontam_dropped"] == 1    # 400, the planted eval leak
    assert stats["n_exact_dropped"] == 1       # 101
    assert stats["n_near_dropped"] == 1 and stats["n_components"] == 1  # 102
    assert stats["n_semantic_dropped"] == 1    # 103, the reordered dup
    assert stats["n_kept"] == 31
    assert stats["embedded"] and len(stats["sq8_params"]["mins"]) == 32
    assert stats["pii_redacted"]["email"] == 1

    kept = spark.read.parquet(out_path)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 100 in ids and not {101, 102, 103, 200, 201, 202, 300, 400} & ids
    dt = dict(kept.dtypes)
    assert dt["embedding"] == "array<double>" and dt["code"] == "array<tinyint>"
    scrub0 = kept.where("doc_id = 0").collect()[0]
    assert "<PII:email>" in scrub0["text_scrubbed"]
    assert "bob@example.com" in scrub0["text"]   # original untouched
    # SQ8 invariant holds on the written output: every code decodes within
    # step/2 of the float embedding
    import numpy as np
    p = stats["sq8_params"]
    mins, steps = np.asarray(p["mins"]), np.asarray(p["steps"])
    for r in kept.select("embedding", "code").collect():
        x = np.asarray(r["embedding"])
        dec = mins + (np.asarray(r["code"], np.float64) + 128.0) * steps
        assert (np.abs(x - dec) <= steps / 2 + 1e-9).all()


def test_spark_submit_append_corpus(tmp_path, spark):
    """Incremental append: a new batch deduped against a stored base corpus
    using its PERSISTED band signatures; keeper choice pinned against what
    full-batch dedup over base ∪ batch would decide."""
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)

    base_words = ("the quick brown fox jumps over the lazy dog and then it "
                  "runs far away into the deep green forest tonight").split()
    base = {i: " ".join(f"b{i}_{j}" for j in range(25)) for i in range(20)}
    base[100] = " ".join(base_words)
    new = {1000 + i: " ".join(f"n{i}_{j}" for j in range(25)) for i in range(10)}
    mut = list(base_words); mut[4] = "cat"
    new[1100] = " ".join(mut)           # near-dup of base 100 -> dropped
    new[1101] = " ".join(base_words)    # exact dup of base 100 -> dropped
    m2 = list(mut); m2[10] = "swam"
    new[1102] = " ".join(m2)            # chain 1100~1102: component anchored
                                        # by base 100 -> dropped too
    n3 = " ".join(f"q_{j}" for j in range(25))
    new[1200] = n3
    new[1201] = n3                      # new x new exact dup -> keep 1200 only

    base_path = str(tmp_path / "base.parquet")
    new_path = str(tmp_path / "new.parquet")
    spark.createDataFrame(sorted(base.items()), "doc_id long, text string"
                          ).write.parquet(base_path)
    spark.createDataFrame(sorted(new.items()), "doc_id long, text string"
                          ).write.parquet(new_path)

    from tiledspark.textops import band_signatures
    sig_path = str(tmp_path / "base_sigs.parquet")
    band_signatures(spark.read.parquet(base_path), "doc_id").write.parquet(sig_path)

    out_path = str(tmp_path / "kept.parquet")
    sig_out = str(tmp_path / "new_sigs.parquet")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "append_corpus.py"),
            "--new-docs", new_path,
            "--base-docs", base_path,
            "--base-signatures", sig_path,
            "--signatures-out", sig_out,
            "--out", out_path,
            "--min-jaccard", "0.5",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_new"] == 15
    assert stats["n_dropped_vs_base"] == 3      # 1100, 1101, 1102
    assert stats["n_dropped_within_batch"] == 1  # 1201
    assert stats["n_kept"] == 11
    kept = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert 1200 in kept and not {1100, 1101, 1102, 1201} & kept
    # kept-new signatures written for the next append
    sigs = spark.read.parquet(sig_out)
    assert set(sigs.columns) == {"doc_id", "band_idx", "band_hash"}
    assert {r["doc_id"] for r in sigs.select("doc_id").distinct().collect()} == kept


def test_spark_submit_assemble_training_set(tmp_path, spark):
    """jobs/assemble_training_set.py end-to-end: mix a source-skewed corpus
    to 50/50 token shares, shuffle deterministically, pack into sequences —
    the training-set assembly step downstream of prepare_corpus."""
    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)

    # source A: 160 docs x ~40 BPE tokens; source B: 40 docs (4x skew)
    rows = []
    for i in range(200):
        src = "A" if i < 160 else "B"
        rows.append((i, " ".join("w%d_%d" % (i, j) for j in range(20)), src))
    docs_path = str(tmp_path / "docs.parquet")
    docs_df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    docs_df.write.parquet(docs_path)
    # token accounting through a TRAINED BPE model (op 97 composed into the
    # assembly job) instead of the regexp fallback
    from tiledspark.bpe import train_bpe

    bpe_path = str(tmp_path / "bpe.json")
    with open(bpe_path, "w") as fh:
        json.dump(train_bpe(docs_df, n_merges=100), fh)

    out_dir = str(tmp_path / "assembled")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "assemble_training_set.py"),
            "--docs", docs_path,
            "--out", out_dir,
            "--target", "A=1,B=1",
            "--max-tokens", "256",
            "--shuffle-seed", "7",
            "--rows-per-shard", "64",
            "--bpe-model", bpe_path,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_input_docs"] == 200
    # mixture audit: B upsampled toward parity
    assert stats["mixture"]["B"]["fraction"] > 2.0
    assert abs(stats["mixture"]["A"]["expected_share"] - 0.5) < 1e-6
    corpus = spark.read.parquet(out_dir + "/corpus")
    assert corpus.count() == stats["n_sampled_rows"]
    w = {r["source"]: r["w"] for r in corpus.groupBy("source").agg(F.sum("n_tokens").alias("w")).collect()}
    share_a = w["A"] / (w["A"] + w["B"])
    assert abs(share_a - 0.5) < 0.08
    # packing output: capacity + per-part coverage of the sampled rows
    seqs = spark.read.parquet(out_dir + "/sequences")
    over = seqs.groupBy("seq_id").agg(F.sum("part_tokens").alias("t")).where(F.col("t") > 256).count()
    assert over == 0
    assert stats["packing"]["fill_rate"] > 0.8
    assert stats["packing"]["total_tokens"] == corpus.agg(F.sum("n_tokens")).first()[0]
    # shard manifest: dense positions, fixed shard sizes (last may be short)
    manifest = spark.read.parquet(out_dir + "/manifest")
    n = manifest.count()
    assert n == stats["n_sampled_rows"]
    assert manifest.agg(F.min("global_pos")).first()[0] == 0
    assert manifest.agg(F.max("global_pos")).first()[0] == n - 1
    assert manifest.select("global_pos").distinct().count() == n
    sizes = {r["shard_id"]: r["count"] for r in manifest.groupBy("shard_id").count().collect()}
    assert stats["n_shards"] == len(sizes)
    full = [s for s in sizes.values() if s == 64]
    assert len(full) >= len(sizes) - 1


def test_spark_submit_prepare_corpus_quality_classifier(tmp_path, spark):
    """Stage 1e end-to-end: a seed-trained hashed-TF logistic classifier
    drops junk-vocabulary docs that pass every other screen (deterministic
    hard floor, no Pareto randomness in the test)."""
    import numpy as np

    zip_path = str(tmp_path / "tiledspark.zip")
    _build_zip(zip_path)
    rng = np.random.default_rng(0)
    good_vocab = ["good%d" % j for j in range(30)]
    junk_vocab = ["zzz%d" % j for j in range(30)]

    def doc(vocab, uniq):
        words = ["the", "and", "of", "is", "in"] + list(rng.choice(vocab, 12)) + [uniq]
        rng.shuffle(words)
        return " ".join(words)

    corpus = [(i, doc(good_vocab, "u%d" % i)) for i in range(20)]
    corpus += [(500 + i, doc(junk_vocab, "j%d" % i)) for i in range(3)]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(docs_path)
    pos_path = str(tmp_path / "seed_pos.parquet")
    neg_path = str(tmp_path / "seed_neg.parquet")
    spark.createDataFrame(
        [(1000 + i, doc(good_vocab, "p%d" % i)) for i in range(40)],
        "doc_id long, text string",
    ).write.parquet(pos_path)
    spark.createDataFrame(
        [(2000 + i, doc(junk_vocab, "n%d" % i)) for i in range(40)],
        "doc_id long, text string",
    ).write.parquet(neg_path)

    out_path = str(tmp_path / "prepared.parquet")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "prepare_corpus.py"),
            "--docs", docs_path,
            "--out", out_path,
            "--min-tokens", "5",
            "--min-jaccard", "0.95",
            "--no-embed",
            "--quality-pos", pos_path,
            "--quality-neg", neg_path,
            "--quality-dim", "256",
            "--quality-min-score", "0.5",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_quality_clf_dropped"] == 3
    assert stats["quality_train_acc"] > 0.95
    kept = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert not kept & {500, 501, 502}
    assert set(range(20)) <= kept
