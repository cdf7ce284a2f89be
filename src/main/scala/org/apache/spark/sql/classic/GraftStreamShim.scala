package org.apache.spark.sql.classic

import org.apache.spark.sql.types.StructType

/** Package-placed accessor for `SparkSession.internalCreateDataFrame`,
  * which is `private[sql]`. A v1 streaming `Source.getBatch` must
  * return a DataFrame whose logical plan carries `isStreaming = true`
  * (StreamExecution asserts it); the only way to stamp that flag on a
  * computed plan is this internal constructor — the same call Spark's
  * own FileStreamSource makes (`FileStreamSource.getBatch` in the
  * Spark source). Used ONLY by graft's versioned-store streaming
  * source to wrap the per-batch parquet read. */
object GraftStreamShim {
  def streamingFrom(spark: org.apache.spark.sql.SparkSession,
                    df: org.apache.spark.sql.DataFrame,
                    schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, schema, isStreaming = true)

  /** The sink-side mirror: `Sink.addBatch` receives a DataFrame whose
    * plan is the incremental (streaming) execution — handing it to a
    * batch `.write` trips the "streaming sources must be executed with
    * writeStream" analysis guard. Re-wrapping the SAME distributed
    * rows (queryExecution.toRdd — no driver materialization) as a
    * batch plan is how Spark's own sinks bridge the gap; this exposes
    * the one `private[sql]` constructor call that does it. */
  def batchFrom(spark: org.apache.spark.sql.SparkSession,
                df: org.apache.spark.sql.DataFrame,
                schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, schema, isStreaming = false)
}
