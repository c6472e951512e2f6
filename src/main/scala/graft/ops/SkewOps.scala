package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §6 / the 100 TB design
  * point). AQE's skew-join splitting handles most head keys at runtime;
  * explicit salting is the tool for the pathological case AQE cannot
  * split — ONE key so hot that a single task would still own it after
  * splitting (AQE splits partitions, not identical join keys on the
  * build side of a sort-merge join's same-key group).
  */
object SkewOps {

  /** Salted equi-join: the left (skewed) side gets a deterministic salt
    * in [0, salts); the right side is exploded to ALL salt values, so
    * every (key, salt) pair still meets its matches. The hot key's rows
    * then spread over `salts` shuffle partitions instead of one.
    *
    * Cost model: right side is replicated `salts`× — use when
    * |right| × salts ≪ |left's hot key group|, i.e. a large skewed fact
    * side against a moderate dimension side that is still too big to
    * broadcast.
    *
    * The left salt hashes EVERY left column (not just the keys — keyed
    * salt would land the whole hot key in one bucket and change
    * nothing): a pure projection, deterministic across task retries,
    * where a `rand()` salt would re-salt rows differently on retry
    * while reducers have already fetched the old layout. Fully
    * identical duplicate rows share a salt, which is harmless — they
    * carry no skew a split could fix.
    *
    * Join types: `inner`, `left`, `left_semi`, `left_anti` — the ones
    * where replicating the RIGHT side cannot change multiplicity of the
    * result. Right/full joins would duplicate unmatched right rows
    * `salts`× and are rejected.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1 (got $salts)")
    val allowed = Set("inner", "left", "left_outer", "left_semi", "left_anti")
    require(allowed.contains(joinType),
      s"saltedJoin supports $allowed (right/full joins would replicate " +
        s"unmatched right rows); got '$joinType'")
    val salt = ColNames.fresh((left.columns ++ right.columns).toSet, "_salt")
    // xxhash64 rejects MapType anywhere in a column's type; hash the
    // hashable columns only (callers with huge array/binary payloads can
    // pre-project — the salt only needs SOME row-varying input). If
    // nothing else is hashable, fall back to the keys: degenerate (one
    // bucket per key) but still correct.
    def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashSafe(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashSafe(a.elementType)
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashSafe(f.dataType)).map(f => col(f.name))
    val saltInput = if (hashCols.nonEmpty) hashCols.toSeq else keys.map(col)
    val leftSalted = left.withColumn(salt,
      pmod(xxhash64(saltInput: _*), lit(salts.toLong)).cast("int"))
    val rightSalted = right.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    leftSalted.join(rightSalted, keys :+ salt, joinType).drop(salt)
  }
}
