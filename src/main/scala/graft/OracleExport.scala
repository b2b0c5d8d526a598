package graft

import org.apache.spark.sql.DataFrame

/** Shared plumbing for oracle input exports (chess + approximate
  * family): Verify writes deterministic NON-ANSI artifacts (position
  * streams, probe keys, minhash/simhash signatures, LSH buckets, IVF
  * cells) as parquet here, and the DuckDB oracle SQL recomputes each
  * query's RELATIONAL remainder from them via `read_parquet` — turning
  * rows-only checks into per-round row/schema/hash matches without the
  * oracle ever copying a query result.
  */
object OracleExport {

  /** Export root — a build artifact written by Verify, read back by the
    * driver's DuckDB via absolute-path read_parquet. Defaults to
    * `.graft_oracle` under the CURRENT working directory (Verify and
    * the DuckDB compare run from the same repo root), overridable with
    * -Dgraft.oracle.export.dir for any other layout; outside target/ so
    * an `sbt clean` between Verify and the compare can't wipe it;
    * gitignored (never committed). */
  val Dir: String = sys.props.getOrElse("graft.oracle.export.dir",
    new java.io.File(".graft_oracle").getAbsolutePath)

  def write(df: DataFrame, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$Dir/$name")

  /** DuckDB table expression for an exported artifact. */
  def p(name: String): String = s"read_parquet('$Dir/$name/*.parquet')"

  /** Delete the export root. Called when an export FAILS so the DuckDB
    * side errors loudly instead of silently comparing against stale
    * parquet from a previous run. */
  def clear(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(Dir))
  }
}
