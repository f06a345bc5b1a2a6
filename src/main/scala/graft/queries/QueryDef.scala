package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable engine operation: a Spark implementation plus (where the
 * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
 * parquet tables. Column names/types and row ordering must agree between
 * the two — the driver hash-compares values after sorting columns by
 * name.
 */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlChecked(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  /** Recreate `root` as an empty directory (recursive delete + mkdir) —
    * the shared helper for queries that stage side tables or file-source
    * inputs under a FIXED /tmp root, so repeated runs overwrite instead
    * of accumulating temp copies. */
  def recreateDir(root: String): java.nio.file.Path = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
  }
}
