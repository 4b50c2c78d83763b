package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for shuffle joins.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime, and it is the first tool to reach for (GraftSession enables
  * it). Explicit salting remains the tool when AQE cannot help: bucketed
  * or pre-partitioned tables whose layout must be preserved, shuffle-hash
  * joins, aggregation-after-join pipelines where one key dominates, or
  * engines/configs without adaptive execution.
  */
object Skew {

  /** Salted inner equi-join: the left (large, possibly skewed) side gets a
    * deterministic per-row salt in [0, salt); the right side is replicated
    * `salt` times; the join key becomes (key, salt), spreading each hot
    * key's rows over `salt` shuffle partitions instead of one. The result
    * is EXACTLY the plain inner join on `keys` — every left row meets
    * every matching right row exactly once, under the one salt value it
    * carries — with the salt column never escaping.
    *
    * The salt is a hash of the whole left row (xxhash64 over a struct of
    * all columns), so it is deterministic across retries and partition
    * layouts — no rand(), whose per-task reseeding breaks retry
    * idempotency mid-shuffle. Identical rows share a salt, which is
    * harmless: skew comes from many DISTINCT rows sharing a KEY.
    *
    * Cost model: right side grows `salt`x (use for moderate-size right
    * sides that are too big to broadcast but cheap to replicate); left
    * side is untouched. At 100 TB the win is turning one straggler
    * partition holding a hot key's entire row set into `salt` even
    * slices. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt >= 2, s"salt must be >= 2 (1 is a plain join), got $salt")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    // working column name must not collide with a user column — withColumn
    // would silently replace it and the final drop would eat the user's data
    val saltName = Iterator.from(0)
      .map(i => if (i == 0) "__salt" else s"__salt_$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n))
      .get
    // hash only columns xxhash64 accepts (MapType — anywhere in a nested
    // type — is unhashable and would fail at analysis time). Keys are
    // always hashable: an equi-join already requires equatable key types.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    // when the only hashable columns ARE the join keys (e.g. left =
    // (key, map-payload)), a pure content hash is a function of the key —
    // every hot-key row would land in ONE salt bucket and the mitigation
    // would silently degrade to a plain join. Mix in a row-local
    // disambiguator: partition id + in-partition row index, deterministic
    // on recompute for a deterministic upstream (same class of retry
    // idempotency as the content hash; the join result never depends on
    // WHICH salt a row gets, only that it gets exactly one).
    val keysOnly = !hashCols.exists(c => !keys.contains(c))
    val hashInput =
      if (keysOnly)
        struct((hashCols.map(col) ++ Seq(spark_partition_id().cast("long"),
          monotonically_increasing_id())).toSeq: _*)
      else struct(hashCols.map(col).toSeq: _*)
    val saltCol = pmod(xxhash64(hashInput), lit(salt))
    val saltedLeft = left.withColumn(saltName, saltCol)
    // replicate the right side once per salt value with a generator — a
    // narrow map, no join against an auxiliary range frame
    val saltedRight = right
      .withColumn(saltName, explode(lit((0L until salt.toLong).toArray)))
    saltedLeft
      .join(saltedRight, keys :+ saltName)
      .drop(saltName)
  }
}
