package graft.gold

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** MERGE-upsert emulation over plain Parquet.
  *
  * The reference uses Delta `MERGE … whenMatchedUpdateAll /
  * whenNotMatchedInsertAll` (ref: mnt/airflow/scripts/silver_to_gold_on_minio.py:127-144).
  * With no Delta in the environment we reproduce the exact row-level
  * semantics as a library op (SURVEY.md §7.3/7.4):
  *
  *   result = target ⟕anti updates ∪ updates       (whole-row update)
  *
  * For the path-based form, read-modify-write on the same directory
  * would hit "Cannot overwrite a path that is also being read from", so
  * we write to a sibling temp dir and atomically swap.
  */
object Upsert {

  /** Pure DataFrame form: rows of `target` whose key matches a row in
    * `updates` are replaced wholesale; unmatched `updates` rows are
    * inserted. Schemas must be union-compatible by name. */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Path-based form with bootstrap: if `path` doesn't exist yet, plain
    * overwrite (the reference's `DeltaTable.isDeltaTable` branch,
    * ref: silver_to_gold_on_minio.py:131-144). */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame, keys: Seq[String]): Unit = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) {
      updates.write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      val target = spark.read.parquet(path)
      val merged = merge(target, updates, keys)
      val tmp = path.stripSuffix("/") + "__upsert_tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      deleteRecursively(dir)
      Files.move(Paths.get(tmp), dir, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
