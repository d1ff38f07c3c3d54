package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-buster equi-join: salt the HOT keys so one pathological key
  * (the null-ish tenant, the bot user, the default partition) spreads
  * over `replicas` reducers instead of stalling one task for the
  * stage — the hand-rolled counterpart of AQE's skew-join split,
  * usable when the skew is in a shuffle AQE won't rewrite (or to pin
  * the shape rather than hope runtime stats catch it).
  *
  * Mechanics: one column-pruned census over the big side finds keys
  * above `hotThreshold`; that key set broadcasts (it is by definition
  * small — skew means FEW keys carry the mass). Hot big-side rows get
  * a deterministic per-row salt (hash of `rowIdCol` mod replicas);
  * the small side replicates hot keys across all salts (cold keys ride
  * salt 0, unreplicated). The join key becomes (key, salt), and the
  * result set is EXACTLY the plain join's — the oracle replays it as
  * one — for any 1:N or M:N multiplicity (each big row still meets
  * each matching small row exactly once, under exactly one salt).
  *
  * Cost model at 100 TB: the census is a map-side-combined count on
  * ONE column; the small side grows by |hot| × replicas rows only;
  * the big side never duplicates. The alternative — a stage whose
  * slowest task holds the hot key's entire mass — is the thing that
  * turns a 10-minute job into a 10-hour one. */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      rowIdCol: String, replicas: Int,
      hotThreshold: Long): DataFrame = {
    require(replicas >= 2, s"saltedJoin: replicas must be >= 2, got $replicas")
    val hot = big.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(keyCol), lit(true).as("__hot"))
    val bigS = big.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(col(rowIdCol)), lit(replicas.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val smallS = small.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__salts",
        when(col("__hot"), sequence(lit(0L), lit(replicas.toLong - 1)))
          .otherwise(array(lit(0L))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__hot", "__salts")
    bigS.join(smallS, Seq(keyCol, "__salt")).drop("__salt")
  }
}
