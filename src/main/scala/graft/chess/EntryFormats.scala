package graft.chess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry-store format generations (SURVEY.md §1.2: the reference ships
  * four on-disk formats — alpha/beta/delta/epsilon — trading entry size
  * against measure fidelity; `[ref-H: src/persistence/pos_db/
  * {alpha,beta,delta,epsilon}/]`, byte layouts unverifiable against the
  * empty mount).
  *
  * Spark-first, a "format" is not a byte layout but (a) WHICH measure
  * columns the store keeps and (b) HOW it lays them out physically —
  * Parquet encodings make fixed-size packing moot, so the real contract
  * is the measure set and the pruning behavior:
  *
  *  - Delta: full fidelity — games, eloDiffSum, firstGameId,
  *    lastGameId (what `ChessIngest.positionsAgg` emits; the library
  *    default, needed by the J2 header join).
  *  - Beta: drops elo tracking, keeps first/last game ids.
  *  - Alpha: count-only measures, physically partitioned by `level`
  *    (the role of the reference's per-level sub-databases: a
  *    level-filtered query prunes whole directories before any I/O).
  *  - Epsilon: most compact — count-only, level/result collapsed out of
  *    the key, so one entry per (signature, reverseMove). Serves
  *    explorer/popularity queries at minimum bytes; cannot answer
  *    per-level/result splits (absent measures are FORMAT-level,
  *    matching the reference's no-nulls contract).
  */
object EntryFormats {

  sealed abstract class Format(val name: String,
                               /** measure columns kept beyond the key */
                               val measures: Seq[String],
                               /** key columns (epsilon collapses lvl/res) */
                               val keys: Seq[String])
  case object Alpha extends Format("alpha", Seq("games"),
    Seq("posHi", "posLo", "reverseMove", "level", "result"))
  case object Beta extends Format("beta",
    Seq("games", "firstGameId", "lastGameId"),
    Seq("posHi", "posLo", "reverseMove", "level", "result"))
  case object Delta extends Format("delta",
    Seq("games", "eloDiffSum", "firstGameId", "lastGameId"),
    Seq("posHi", "posLo", "reverseMove", "level", "result"))
  case object Epsilon extends Format("epsilon", Seq("games"),
    Seq("posHi", "posLo", "reverseMove"))

  val All: Seq[Format] = Seq(Alpha, Beta, Delta, Epsilon)
  def byName(n: String): Format =
    All.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown entry format: $n"))

  /** Project a full (delta-shaped) agg store down to `fmt`'s key +
    * measure set. Epsilon re-aggregates (its key is coarser); the
    * others are pure column pruning — Catalyst pushes the projection
    * into the scan. */
  def project(agg: DataFrame, fmt: Format): DataFrame = fmt match {
    case Epsilon =>
      agg.groupBy(Epsilon.keys.map(col): _*)
        .agg(sum(col("games")).as("games"))
    case f => agg.select((f.keys ++ f.measures).map(col): _*)
  }

  /** Write `agg` in format `fmt` under `dir`. Alpha partitions by
    * level (directory pruning for level-filtered probes — the 9-way
    * sub-database role); all formats sort within files by the
    * signature so row-group min/max stats prune point probes. */
  def write(agg: DataFrame, fmt: Format, dir: String): Unit = {
    val proj = project(agg, fmt).sortWithinPartitions(col("posHi"), col("posLo"))
    val w = proj.write.mode("overwrite")
    (fmt match {
      case Alpha => w.partitionBy("level")
      case _ => w
    }).parquet(dir)
  }

  /** Read a store written by `write`; schema is the format's contract
    * (a missing-measure query fails at analysis, not silently). */
  def read(spark: SparkSession, fmt: Format, dir: String): DataFrame = {
    val df = spark.read.parquet(dir)
    // partition-dir inference may widen types (level dirs read as int)
    val level = if (df.schema.fieldNames.contains("level"))
      Seq(col("level").cast("byte").as("level")) else Nil
    val others = (fmt.keys ++ fmt.measures).filterNot(_ == "level").map(col)
    df.select((others ++ level): _*)
      .select((fmt.keys ++ fmt.measures).map(col): _*)
  }
}
