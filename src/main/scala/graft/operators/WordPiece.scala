package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style subword segmentation — greedy LONGEST-MATCH-FIRST
  * against a frequency-derived piece vocabulary, the third tokenizer
  * family next to BPE (merge-order inference, `Bpe`) and Unigram-LM
  * (Viterbi, `Unigram`): BERT's tokenizer walks a word left to right
  * taking the longest vocabulary piece at each cursor, continuation
  * pieces marked `##`.
  *
  * Everything runs on the DISTINCT-WORD table (the corpus collapses
  * first — |vocab| rows do all piece work, the idiom every tokenizer
  * op here shares), and the greedy walk is NOT an iterative join: the
  * longest match at EVERY position is resolved up front (bounded
  * in-row (pos, len≤maxPiece) grid, one broadcast semi-join against
  * the vocabulary, one (word, pos) max), and the walk itself is a
  * single codegen'd `aggregate()` fold over positions that hops
  * `cursor += bestLen(cursor)` — O(|word|) per word, zero shuffles
  * beyond the two hash aggs. Single-character pieces are always in
  * vocabulary, so the walk always progresses and never emits UNK.
  */
object WordPiece {

  /** Corpus-wide piece counts under greedy longest-match segmentation:
    * (piece — `##`-marked when not word-initial, n = occurrences
    * weighted by word frequency), top `topK` by (n desc, piece). The
    * vocabulary is data-derived: every substring of length ≤
    * `maxPiece` whose position-weighted corpus total reaches
    * `minCount`, plus all single characters.
    */
  def segmentCounts(docs: DataFrame, textCol: String,
                    minCount: Long, maxPiece: Int = 4,
                    topK: Int = 50): DataFrame = {
    require(maxPiece >= 1 && topK >= 1, s"bad ($maxPiece, $topK)")
    val words = docs.where(col(textCol).isNotNull)
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val grid = words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("pos"))
      .select(col("w"), col("freq"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPiece), length(col("w")) - col("pos") + 1))).as("len"))
      .withColumn("piece", expr("substring(w, pos, len)"))
    val vocab = grid.groupBy(col("piece"))
      .agg(sum(col("freq")).as("total"))
      .where(col("total") >= minCount || length(col("piece")) === 1)
      .select(col("piece"))
    val best = grid.join(broadcast(vocab), Seq("piece"), "left_semi")
      .groupBy(col("w"), col("pos")).agg(max(col("len")).as("bl"))
    // bl as a position-indexed array: every pos 1..|w| is present
    // (single chars always match), so the sorted collect IS the index
    val blArr = best.groupBy(col("w"))
      .agg(array_sort(collect_list(struct(col("pos"), col("bl")))).as("_pb"))
      .select(col("w"), expr("transform(_pb, x -> x.bl)").as("bl"))
    words.join(blArr, Seq("w"))
      .select(col("w"), col("freq"), explode(expr(
        """aggregate(sequence(1, length(w)),
             named_struct('cur', 1,
               'ps', cast(array() as array<struct<pos:int,piece:string>>)),
             (acc, i) -> if(i = acc.cur,
               named_struct('cur', acc.cur + element_at(bl, i),
                 'ps', acc.ps || array(named_struct('pos', i,
                   'piece', substring(w, i, element_at(bl, i))))),
               acc),
             acc -> acc.ps)""")).as("p"))
      .select(col("freq"),
        when(col("p.pos") === 1, col("p.piece"))
          .otherwise(concat(lit("##"), col("p.piece"))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("piece")).limit(topK)
  }
}
