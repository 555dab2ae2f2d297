package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant inner equi-join: when one key on the big side is hot
  * enough to overwhelm a single reducer, salt the big side into `salts`
  * sub-keys and replicate the small side across all salts. Shuffle volume
  * for the small side grows ×salts, but the hot key's rows spread across
  * `salts` reducers. (AQE's skew-join handles sort-merge cases at runtime;
  * explicit salting also covers aggregations-after-join and gives
  * deterministic layout — both are in the toolbox.)
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, key: String, salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
