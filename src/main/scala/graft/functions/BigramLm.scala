package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** TRAINED bigram language model (x23) — the trained-table upgrade of
  * x21's derived arithmetic, the same step x19 took over x17 for BPE:
  * the shipped resource (`resources/graft/bigram_lm.txt`) carries real
  * bigram STATISTICS learned once on a bounded deterministic sample
  * (see [[graft.BigramLmTrain]] for the exact invocation), and the
  * kernel scores documents by table lookup instead of deriving
  * pseudo-random log-probs. Same hashing (the portable polynomial word
  * hash), same bucket arithmetic ([[BigramLogProbKernel.bucket]]), same
  * integer end-to-end discipline — so the DuckDB oracle replays the
  * exact bits by joining the GENERATED table.
  *
  * Table semantics: observed bigram buckets carry a quantized
  * log-frequency `lp = -1000 + round(999 · ln(1+c) / ln(1+c_max))`
  * (StrictMath, machine-independent; ∈ [-999, -1], monotone in count);
  * every unseen bucket is the [[Floor]] (-1000). The keep threshold is
  * the EXPECTED log-prob of one pair under the training distribution
  * (count-weighted table mean, floorDiv, computed at train time and
  * shipped in the resource header) — the CCNet shape, where the cutoff
  * sits at a typical training document's perplexity — so keep/drop
  * compares `lp_sum ≥ threshold · n_pairs` with no division: the x21
  * integer-threshold discipline at a trained operating point.
  */
object BigramLm {
  final val Buckets = 65536
  final val Floor = -1000L

  private def parse(path: String): (IndexedSeq[(Int, Int)], Long) = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"shipped bigram LM resource missing: $path")
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toIndexedSeq
      require(lines.nonEmpty && lines.head.startsWith("threshold "),
        "bigram LM resource must open with its threshold line")
      val threshold = lines.head.substring("threshold ".length).toLong
      val entries = lines.tail.map { l =>
        val i = l.indexOf(' ')
        require(i > 0, s"malformed bigram LM entry: '$l'")
        val b = l.substring(0, i).toInt
        val lp = l.substring(i + 1).toInt
        require(b >= 0 && b < Buckets, s"bucket out of range: $b")
        require(lp > Floor && lp <= -1, s"log-prob out of range: $lp")
        (b, lp)
      }
      require(entries.map(_._1).distinct.size == entries.size,
        "duplicate bucket in bigram LM resource")
      (entries, threshold)
    } finally in.close()
  }

  private lazy val parsed: (IndexedSeq[(Int, Int)], Long) =
    parse("/graft/bigram_lm.txt")

  /** Sparse trained entries (bucket, lp), resource order. */
  lazy val entries: IndexedSeq[(Int, Int)] = parsed._1

  /** Keep threshold per pair (the table's mean log-prob), from the
    * resource header — the trained operating point.
    */
  lazy val thresholdPerPair: Long = parsed._2

  private def buildTable(entries: IndexedSeq[(Int, Int)]): Array[Int] = {
    val t = Array.fill(Buckets)(Floor.toInt)
    entries.foreach { case (b, lp) => t(b) = lp }
    t
  }

  private lazy val table: Array[Int] = buildTable(entries)

  /** The x24 TARGET-domain table (`bigram_lm_target.txt` — same trainer,
    * sample restricted to the target domain's documents): the numerator
    * of the DSIR importance ratio, the raw table above the denominator.
    */
  lazy val targetEntries: IndexedSeq[(Int, Int)] =
    parse("/graft/bigram_lm_target.txt")._1

  private lazy val targetTable: Array[Int] = buildTable(targetEntries)

  /** Trained log-prob of one bigram bucket. */
  def logProb(bucket: Long): Long = table(bucket.toInt).toLong

  private def computeWith(t: Array[Int], words: ArrayData): Long = {
    var sum = 0L
    var prev = -1L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numChars() > 0) {
          val h = PolyWordHashKernel.hashWord(w, 7L, 11L)
          if (prev >= 0L) sum += t(BigramLogProbKernel.bucket(prev, h).toInt).toLong
          prev = h
        }
      }
      i += 1
    }
    sum
  }

  /** Σ trained-logProb over adjacent non-empty tokens; called from
    * codegen (the [[BigramLogProbKernel.compute]] loop over the trained
    * table).
    */
  def compute(words: ArrayData): Long = computeWith(table, words)

  /** Same sum under the TARGET-domain table; called from codegen. */
  def computeTarget(words: ArrayData): Long = computeWith(targetTable, words)
}

/** Trained-table bigram-LM log-probability sum of an array<string>
  * token column (see [[BigramLm]]); `graft_bigram_logprob_lm` in SQL.
  */
case class TrainedBigramLogProb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bigram_logprob_lm"

  override def nullSafeEval(input: Any): Any =
    BigramLm.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bk = classOf[BigramLm.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $bk.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): TrainedBigramLogProb =
    copy(child = newChild)
}

/** TARGET-domain trained bigram-LM log-probability sum (the numerator
  * of x24's DSIR importance ratio; see [[BigramLm.computeTarget]]);
  * `graft_bigram_logprob_target` in SQL.
  */
case class TargetBigramLogProb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bigram_logprob_target"

  override def nullSafeEval(input: Any): Any =
    BigramLm.computeTarget(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val bk = classOf[BigramLm.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $bk.computeTarget($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): TargetBigramLogProb =
    copy(child = newChild)
}
