package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name   key in `SparkEntry.queries`
  * @param run    (session, sfDir) => result DataFrame. Result must be
  *               deterministically ordered (explicit orderBy) and every
  *               computed column aliased identically to `oracle`.
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None → driver records a weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
