package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnBridge

/** Bloom-filter primitives, bridged from Spark's own runtime-filter
  * expressions (`BloomFilterAggregate`/`BloomFilterMightContain` — the
  * machinery behind `spark.sql.optimizer.runtimeFilter.bloomFilter`).
  * They are registry-internal in Spark 4, so the engine exposes them as
  * `Column`s via the graftshim bridge rather than SQL names.
  *
  * The at-scale membership pattern: a benchmark/blocklist set compresses
  * to a few-MB binary that broadcasts for free, the corpus scan prefilters
  * with `mightContain` (no join), and only candidate hits pay the exact
  * verification join. False positives are removed by the verify step, so
  * composed operators stay EXACT. */
object BloomFunctions {

  /** Aggregate: a bloom filter (binary) over `xxhash64` longs.
    * `expectedItems`/`numBits` size the filter (~bits/item ≈ 10 → ~1% fp). */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a [[bloomAgg]] binary against an `xxhash64` long. */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))
}
