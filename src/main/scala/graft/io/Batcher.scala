package graft.io

import org.apache.spark.sql.DataFrame

/** O4 — limit/offset batch processing, surface parity with the reference's
  * SparkUtils.batch_process (src/utils/spark_utils.py:59-84).
  *
  * NOTE: this helper is dead weight at scale — limit+offset forces a global
  * ordering boundary per batch, so N batches rescan the input N times, and
  * Spark's own task parallelism already "batches" work. It exists because
  * the reference declares the API; the pipeline never routes through it
  * (the reference's notebook 02 computes batches then ignores them, too).
  */
object Batcher {

  /** Process df in limit/offset batches and union the results, exactly like
    * the reference: batch i = df.offset(i*batchSize).limit(batchSize).
    */
  def batchProcess(df: DataFrame, batchSize: Int)
                  (processFunc: DataFrame => DataFrame): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val total = df.count()
    val numBatches = ((total + batchSize - 1) / batchSize).toInt
    val processed = (0 until math.max(numBatches, 1)).map { i =>
      processFunc(df.offset(i * batchSize).limit(batchSize))
    }
    processed.reduce(_ union _)
  }
}
