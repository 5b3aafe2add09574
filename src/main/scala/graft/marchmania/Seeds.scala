package graft.marchmania

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tournament seed parsing. ≙ reference `src/features/seeds.py:24-51` (F2):
  * `"W01"`/`"X16a"` → SeedRegion (leading letter) + SeedNum (two digits);
  * the play-in `a`/`b` suffix is intentionally dropped. Pure codegen'd
  * projection, no shuffle.
  */
object Seeds {
  private val Pattern = "^([A-Z])(\\d{2})"

  def parse(seeds: DataFrame): DataFrame =
    seeds.select(
      col("Season").cast("int").as("Season"),
      col("TeamID").cast("int").as("TeamID"),
      col("Seed"),
      regexp_extract(col("Seed"), Pattern, 1).as("SeedRegion"),
      regexp_extract(col("Seed"), Pattern, 2).cast("int").as("SeedNum"))
}
