package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: when one join key dominates (a hot
  * customer, a boilerplate document), a plain shuffle join puts the
  * whole hot key in one task. Salting splits it: the big side gets a
  * deterministic salt in [0, saltFactor), the small side is replicated
  * once per salt value, and the join runs on (key, salt) — the hot key
  * now spreads over `saltFactor` tasks. (AQE's skew-join handles the
  * sort-merge case adaptively; explicit salting also covers hash
  * joins and pre-AQE planning.)
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key` with salt spreading. Both inputs
    * must carry `key` under the same name; output = the plain join's
    * columns. The salt is a hash of the big side's full row, so the
    * result is deterministic run to run.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // The small side is replicated once per salt value, so any join
    // type that can emit unmatched SMALL-side rows (right/full outer)
    // would emit them saltFactor times. Only inner/left-side types are
    // salt-correct.
    val normalized = joinType.toLowerCase.replace("outer", "").replace("_", "")
    require(Set("inner", "left", "leftsemi", "semi", "leftanti", "anti")
        .contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
