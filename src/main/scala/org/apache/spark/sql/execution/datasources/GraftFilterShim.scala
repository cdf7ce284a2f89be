package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Package-placed accessor for `DataSourceStrategy.translateFilter`,
  * which is `protected[sql]`. The alternative is re-implementing
  * catalyst→sources filter translation — attribute extraction, literal
  * externalization, null-safety per operator — that Spark already
  * maintains and tests; a 5-line shim in the owning package is the
  * smaller liability, and the same pattern every external connector
  * (Delta's DeltaTableUtils shims, spark-avro's accessors) uses for
  * this exact seam. Used ONLY by graft.sql's manifest data skipping to
  * turn pushed conjuncts into `sources.Filter`s the stats evaluator
  * understands. */
object GraftFilterShim {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
