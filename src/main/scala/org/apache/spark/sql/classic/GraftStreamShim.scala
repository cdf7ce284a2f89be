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
}
