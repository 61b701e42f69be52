package graft.textops

import graft.{Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data assembly operators — the stages between a curated
  * corpus and a token stream: sub-document dedup (the C4 device),
  * sequence packing, epoch-mix resampling, and reproducible sampling.
  *
  * Scale design: d30 is one shuffle keyed by block text (the global
  * keep-first decision is a window over that key — same cost as exact
  * dedup, 8× the key count); d31 is one shuffle on the shard key and a
  * streaming in-partition scan with O(1) state; d32 is row-local
  * arithmetic plus an explode (output-proportional, no shuffle); d33 is
  * a bounded-state mergeable aggregation (K rows per group cross the
  * wire, never the group).
  */
object Packing {

  /** Sub-document (block-level) exact dedup, C4-style: documents split
    * into non-overlapping 8-word blocks; each distinct block survives
    * only at its FIRST corpus occurrence (doc_id, block_no order), and
    * documents are reassembled from their kept blocks. */
  val d30_block_dedup = Q(
    (s, dir) => {
      val blocks = T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast(ceil(size(w) / 8.0) as int) - 1), " +
            "i -> array_join(slice(w, 8 * i + 1, 8), ' '))")))
        .withColumnRenamed("pos", "bno")
        .withColumnRenamed("col", "blk")
      val w = Window.partitionBy(col("blk")).orderBy(col("doc_id"), col("bno"))
      blocks
        .withColumn("rk", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("kept"),
          array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN rk = 1 THEN struct(bno, blk) END)), x -> x.blk)"),
            " ").as("text_kept"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      b AS (SELECT doc_id, i AS bno,
              array_to_string(w[8 * i + 1 : 8 * i + 8], ' ') AS blk
            FROM t, unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS u(i)),
      r AS (SELECT doc_id, bno, blk,
              row_number() OVER (PARTITION BY blk ORDER BY doc_id, bno) AS rk
            FROM b)
      SELECT doc_id, count(*) AS n_blocks,
             CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
             coalesce(string_agg(CASE WHEN rk = 1 THEN blk END, ' ' ORDER BY bno), '') AS text_kept
      FROM r GROUP BY doc_id ORDER BY doc_id"""))

  /** Sequence packing (next-fit): per shard, documents in doc_id order
    * fill fixed token-budget packs; a doc that would overflow opens the
    * next pack. The inherently sequential scan runs INSIDE each
    * partition after one shuffle on the shard key — shards are
    * independent, so 100 TB packs with the parallelism of the shard
    * count, and task state is three longs. Oracle = the same recurrence
    * as a recursive CTE. */
  val d31_seq_packing = Q(
    (s, dir) => {
      import s.implicits._
      val budget = 200L
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 4).as("shard"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .as[(Long, Long, Long)]
      docs
        .repartition(col("shard"))
        .sortWithinPartitions("shard", "doc_id")
        .mapPartitions { it =>
          var shard = Long.MinValue
          var pack = 0L
          var cum = 0L
          it.map { case (docId, sh, n) =>
            if (sh != shard || cum + n > budget) {
              pack = if (sh != shard) 1L else pack + 1L
              cum = n
              shard = sh
            } else cum += n
            (docId, sh, pack, n)
          }
        }
        .toDF("doc_id", "shard", "pack_id", "n_tokens")
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE d AS (
        SELECT doc_id, doc_id % 4 AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % 4 ORDER BY doc_id) AS rn
        FROM documents),
      rec(shard, rn, doc_id, n_tokens, pack_id, cum) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(1 AS BIGINT), n_tokens
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN rec.cum + d.n_tokens > 200 THEN rec.pack_id + 1 ELSE rec.pack_id END,
               CASE WHEN rec.cum + d.n_tokens > 200 THEN d.n_tokens ELSE rec.cum + d.n_tokens END
        FROM rec JOIN d ON d.shard = rec.shard AND d.rn = rec.rn + 1)
      SELECT doc_id, shard, pack_id, n_tokens FROM rec ORDER BY doc_id"""))

  /** Epoch-mix resampling: per-source target weights (fractional epochs,
    * the training-mix device) realized as floor(w) full copies plus one
    * more where the shared [[HashSelect]] u32 hash (mod 1e6) falls
    * under the integer threshold for the fractional part — so a
    * 1.25-weight source upsamples exactly 25% of its docs, reproducibly
    * under any layout, with no float on either side of the compare. */
  val d32_mix_resample = Q(
    (s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (lit(0.5) + (expr("substring(source, 4)").cast(IntegerType) % 4) * 0.75).as("w"),
          (HashSelect.u32(col("doc_id")) % 1000000L).as("m"))
        .withColumn("reps",
          (floor(col("w")) + when(
            col("m") < ceil((col("w") - floor(col("w"))) * lit(1e6)).cast(LongType),
            1L).otherwise(0L)).cast(LongType))
        .filter(col("reps") >= 1)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("reps"))).as("copy_no"))
        .orderBy("doc_id", "copy_no")
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, source,
               0.5 + (CAST(substr(source, 4) AS INT) % 4) * 0.75 AS w,
               ${HashSelect.u32Sql("doc_id")} % 1000000 AS m
        FROM documents),
      r AS (SELECT doc_id, source,
              CAST(floor(w) + CASE WHEN m < CAST(ceil((w - floor(w)) * 1e6) AS BIGINT)
                              THEN 1 ELSE 0 END AS BIGINT) AS reps
            FROM d)
      SELECT doc_id, source, CAST(u.copy_no AS BIGINT) AS copy_no
      FROM r, unnest(range(1, reps + 1)) AS u(copy_no)
      ORDER BY doc_id, copy_no"""))

  /** Reproducible per-source sample via the mergeable bottom-K sketch
    * (functions/Sketches.BottomK): the aggregation ships at most K rows
    * per group per partial, and — because bottom-K by a hash IS a
    * deterministic order statistic, not an RNG draw — the result
    * hash-matches a plain row_number-over-hash oracle. */
  val d33_bottomk_sample = Q(
    (s, dir) => {
      val bottomK = udaf(new graft.functions.Sketches.BottomK(5))
      T(s, dir, "documents")
        .select(col("source"),
          md5(col("doc_id").cast(StringType)).as("h"), col("doc_id"))
        .groupBy(col("source"))
        .agg(bottomK(col("h"), col("doc_id")).as("ids"))
        .select(col("source"), posexplode(col("ids")))
        .select(col("source"), col("col").as("doc_id"),
          (col("pos") + 1).cast(IntegerType).as("rk"))
        .orderBy("source", "rk")
    },
    Some("""
      SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents) WHERE rk <= 5
      ORDER BY source, rk"""))

  val all: Map[String, Q] = Map(
    "d30_block_dedup" -> d30_block_dedup,
    "d31_seq_packing" -> d31_seq_packing,
    "d32_mix_resample" -> d32_mix_resample,
    "d33_bottomk_sample" -> d33_bottomk_sample)
}
