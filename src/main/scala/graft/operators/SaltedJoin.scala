package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware inner equi-join: salt the probe side, replicate the
  * build side, join on (key, salt).
  *
  * At 100 TB a single hot key (one viral document id, one null-ish
  * default) concentrates an entire shuffle partition on one task.
  * Salting splits each hot key's rows across `nSalts` partitions at
  * the cost of replicating the build side `nSalts`× — the classic
  * trade when the build side is small-to-medium and AQE's automatic
  * skew-join splitting (which we leave enabled) can't help, e.g. when
  * the skewed stage feeds an aggregation pipeline AQE won't split.
  *
  * Output is EXACTLY the plain inner join's rows (asserted in
  * OperatorSpec and by the q37 DuckDB oracle): every left row meets
  * every matching right row exactly once, because the left row's salt
  * is deterministic and the right row is present at every salt value.
  *
  * The salt is `pmod(hash(saltExpr), nSalts)` — any expression with
  * per-row spread works; prefer a column unique-ish per row (line
  * number, event id), never the join key itself (same-key rows would
  * all land on one salt, defeating the point).
  */
object SaltedJoin {

  def innerJoin(left: DataFrame, right: DataFrame, key: String,
                saltExpr: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val salted = left.withColumn("__salt", pmod(hash(saltExpr), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
