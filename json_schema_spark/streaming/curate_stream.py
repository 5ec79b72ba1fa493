"""Streaming corpus curation: the end-to-end `curate_corpus` chain run
incrementally per micro-batch (r4 VERDICT #7).

The expensive curation stages are all streamable — they touch each
document once:

1. row-local annotate + quality filters — the SAME Catalyst expressions
   as the batch pipeline (``pipeline.curate.annotate_and_filter``), per
   micro-batch;
2. exact dedup — batch-local min-id-per-fingerprint, then an anti-join
   against the fingerprint store (first-seen-wins across batches, the
   ``dedup_stream`` contract: replaying in ascending id order reproduces
   the batch min-id choice);
3. near-dup PAIR discovery — the batch's shingles join the accumulated
   shingle store (plus the batch-local self-join), exact Jaccard from
   stored per-doc shingle counts; pairs at/above threshold append to the
   pair store. Like the LSH stream, each pair is found exactly once — in
   the micro-batch where its later document arrives.

What is NOT streamed is the final connected-components resolution: a
duplicate component's minimum id can be bridged by a LATER document
(edges (1,9),(5,9) arriving in id order keep 5 until 9 connects it to
1), so any per-batch survivor emission would need retractions. Instead
the stream maintains ``kept/`` (stage-1+2 survivors) and ``pairs/``
(near-dup edges), and :func:`curated_survivors` finalizes: one CC over
the pair table — O(pairs), tiny next to the corpus the stream already
chewed through — then the deterministic hash split. Replay + finalize
reproduces the batch ``curate_corpus`` row set exactly (parity pytest).

Store layout mirrors lsh_stream's scale contract: the fingerprint and
shingle stores are parquet partitioned by a hash shard of their join key
(``pmod(xxhash64(key), n_shards)``), and every per-batch read is pruned
to the batch's own shard set — scan cost O(batch keys' shards), not
O(everything seen so far). The per-doc size store is read whole, but it
is two longs per kept document. The freq-cut (``max_shingle_freq``) is a
batch-side join-bound optimization with no stable streaming analog
(frequencies grow over time, and batches already emitted pairs through
shingles that later cross the cut); the streaming path computes exact
Jaccard instead — compare against ``curate_corpus(...,
max_shingle_freq=None)``.

foreachBatch is at-least-once: on restart a replayed batch re-appends
rows to every store, and a PARTIAL failure can leave any prefix of the
five appends committed. Three defenses make replay a no-op:

- ``curated_survivors`` dedups (``kept`` on doc_id, pairs on the pair
  key);
- the fingerprint store carries ``batch_id`` and the exact-dedup
  anti-join ignores rows the CURRENT batch wrote: without this, a
  failure after the fp_store append makes the replay's anti-join drop
  the whole batch — its shingle/size rows are then never written and
  every future near-dup pair against those documents is silently lost
  (kept survivors that curate_corpus would have removed);
- the shingle/size store reads dedup ACROSS the batch∪store union, not
  just within the store: after a failure past the shingle append the
  replayed batch's rows sit in both branches, and a doubled
  (doc, shingle) row inflates ``common`` — wrong Jaccard for
  batch-internal pairs, not just wasted bytes.

Replay determinism relies on the Structured Streaming contract that a
replayed batch_id re-delivers the same rows (true for replayable
sources — files, Kafka).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.curate import annotate_and_filter
from ..pipeline.dedup import duplicate_clusters, fingerprint, shingles
from ..pipeline.sampling import hash_split
from .lsh_stream import _hadoop_path_exists, check_store_shards

SHARD_COL = "shard"


def _with_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    return df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(key), F.lit(n_shards)))


def _pruned_read(spark: SparkSession, path: str, key_df: DataFrame):
    """Shard-pruned store read: None when the store does not exist yet
    (first batch), else the store filtered to ``key_df``'s shard set."""
    if not _hadoop_path_exists(spark, path):
        return None
    shards = [r[SHARD_COL] for r in
              key_df.select(SHARD_COL).distinct().collect()]
    return spark.read.parquet(path).where(F.col(SHARD_COL).isin(shards))


def curate_stream(stream_df: DataFrame, out_dir: str, *,
                  min_tokens: int = 10, max_dup_frac: float = 0.2,
                  langs: Sequence[str] = ("en", "de", "es", "fr"),
                  jaccard_n: int = 3, jaccard_threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_shards: int = 64):
    """Wire a streaming documents DataFrame into the incremental curation
    pass. Returns a ``DataStreamWriter`` (caller ``.start()``s it).
    Stores under ``out_dir``: kept/ fp_store/ shingle_store/ sizes/
    pairs/. Finalize with :func:`curated_survivors`."""
    kept_path = f"{out_dir}/kept"
    fp_path = f"{out_dir}/fp_store"
    sh_path = f"{out_dir}/shingle_store"
    sz_path = f"{out_dir}/sizes"
    pairs_path = f"{out_dir}/pairs"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a shard-count change would silently break the pruned store
        # reads — pinned per out_dir, loud mismatch (see check_store_shards)
        check_store_shards(spark, f"{out_dir}/_jss_store_meta.json", n_shards)
        ann = annotate_and_filter(
            batch_df, min_tokens=min_tokens, max_dup_frac=max_dup_frac,
            langs=langs, jaccard_n=jaccard_n, text_col=text_col,
            id_col=id_col)

        # exact dedup: min id per fingerprint WITHIN the batch, then drop
        # fingerprints already in the store (first-seen-wins across batches)
        fp = ann.withColumn("fp", fingerprint(F.col(text_col)))
        firsts = (fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
                  .select(id_col))
        cand = _with_shard(fp.join(firsts, id_col, "left_semi"),
                           "fp", n_shards).persist()
        sh_b = None
        batch_kept = cand
        try:
            store_fp = _pruned_read(spark, fp_path, cand)
            if store_fp is not None:
                # ignore rows THIS batch wrote (partial-failure replay):
                # the replayed batch's own fps are "already seen" otherwise
                # and the whole batch vanishes before its shingle/size
                # appends — see the module docstring
                if "batch_id" in store_fp.columns:
                    store_fp = store_fp.where(
                        F.col("batch_id") != F.lit(batch_id))
                batch_kept = cand.join(
                    store_fp.select("fp"), "fp", "left_anti").persist()

            # near-dup pairs: batch shingles vs (store + batch) shingles,
            # exact jaccard via stored per-doc sizes
            sh_b = _with_shard(
                shingles(batch_kept, jaccard_n, text_col, id_col),
                "shingle", n_shards).persist()
            sz_b = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

            new = sh_b.select(F.col(id_col).alias("id_new"), "shingle")
            olds = [new.select(F.col("id_new").alias("id_old"), "shingle")]
            store_sh = _pruned_read(spark, sh_path, sh_b)
            if store_sh is not None:
                olds.append(store_sh.select(F.col(id_col).alias("id_old"),
                                            "shingle"))
            other = olds[0] if len(olds) == 1 else olds[0].unionByName(olds[1])
            if store_sh is not None:
                # dedup across the batch∪store UNION, not just the store:
                # a partial-failure replay leaves the batch's rows in BOTH
                # branches, and any doubled (doc, shingle) row inflates
                # `common` — wrong Jaccard, not just wasted bytes
                other = other.dropDuplicates(["id_old", "shingle"])
            common = (new.join(other, "shingle")
                      .where(F.col("id_new") != F.col("id_old"))
                      .groupBy("id_new", "id_old")
                      .agg(F.count(F.lit(1)).alias("common")))
            sizes_all = [sz_b]
            if _hadoop_path_exists(spark, sz_path):
                sizes_all.append(spark.read.parquet(sz_path))
            sizes = (sizes_all[0] if len(sizes_all) == 1
                     else sizes_all[0].unionByName(sizes_all[1])
                     # union-level dedup — same partial-replay hazard as
                     # the shingle branch; duplicate rows agree on n_sh,
                     # so keeping an arbitrary one is sound
                     .dropDuplicates([id_col]))
            sa = sizes.select(F.col(id_col).alias("id_new"),
                              F.col("n_sh").alias("na"))
            sb = sizes.select(F.col(id_col).alias("id_old"),
                              F.col("n_sh").alias("nb"))
            pairs = (common.join(sa, "id_new").join(sb, "id_old")
                     .withColumn("jaccard",
                                 F.col("common").cast("double")
                                 / (F.col("na") + F.col("nb")
                                    - F.col("common")).cast("double"))
                     .where(F.col("jaccard") >= jaccard_threshold)
                     .select(F.least("id_new", "id_old").alias("id_a"),
                             F.greatest("id_new", "id_old").alias("id_b"))
                     .distinct())

            # commits: pairs first (idempotent under replay via the
            # finalizer's distinct), then the stores the NEXT batch joins
            pairs.write.mode("append").parquet(pairs_path)
            (batch_kept.select(id_col, "lang", "n_tokens",
                               F.round("__dup_frac", 6).alias("dup_frac_r6"))
             .write.mode("append").parquet(kept_path))
            (batch_kept.select("fp", SHARD_COL)
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").partitionBy(SHARD_COL).parquet(fp_path))
            sh_b.write.mode("append").partitionBy(SHARD_COL).parquet(sh_path)
            sz_b.write.mode("append").parquet(sz_path)
        finally:
            # unpersist in finally: a failed write otherwise leaks cached
            # frames per retry in a long-running stream
            cand.unpersist()
            if batch_kept is not cand:
                batch_kept.unpersist()
            if sh_b is not None:
                sh_b.unpersist()

    return stream_df.writeStream.foreachBatch(process)


def curated_survivors(spark: SparkSession, out_dir: str, *,
                      splits: Optional[Dict[str, float]] = None,
                      seed: int = 42,
                      id_col: str = "doc_id") -> DataFrame:
    """Finalize a curation stream: connected components over the
    accumulated pair store, drop non-representatives, hash-split. Output
    schema matches ``curate_corpus`` (doc_id, lang, n_tokens,
    dup_frac_r6, split). Safe to call repeatedly while the stream runs —
    each call is a consistent snapshot of the stores read at that moment."""
    kept = spark.read.parquet(f"{out_dir}/kept").dropDuplicates([id_col])
    if _hadoop_path_exists(spark, f"{out_dir}/pairs"):
        pairs = spark.read.parquet(f"{out_dir}/pairs").distinct()
        clusters = duplicate_clusters(pairs, "id_a", "id_b")
        non_reps = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
                    .select(F.col("doc_id").alias(id_col)))
        kept = kept.join(non_reps, id_col, "left_anti")
    return hash_split(kept, splits, id_col, seed).select(
        id_col, "lang", "n_tokens", "dup_frac_r6", "split")
