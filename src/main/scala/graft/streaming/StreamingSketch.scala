package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Sketches

/** Streaming sketch maintenance — the HLL register table kept live by
  * Structured Streaming's native stateful aggregation.
  *
  * Registers are the WHOLE state: one max-rho per (key, bucket), at most
  * keys·4096 rows no matter how many events stream through. That is the
  * sketch's defining property, and it means this is the rare streaming
  * aggregation that needs NO watermark to stay bounded — a streaming
  * count(distinct) would grow state per distinct value forever, while the
  * register table is a fixed-size summary that only ever tightens
  * (max(rho) is monotone). Because register merge is associative,
  * commutative and idempotent, the micro-batch split cannot change the
  * result: any snapshot of the register table estimates exactly what the
  * batch sketch over the same prefix of events would (spec-pinned).
  *
  * Read the estimate with `Sketches.estimateFromRegisters` over any sink
  * snapshot — the same merge path the batch union uses (q40).
  */
object StreamingSketch {

  /** Live HLL registers of `valueCol` per `keys` over a stream: the
    * batch register derivation applied to a streaming frame — Spark's
    * streaming agg maintains max(rho) per (key, bucket) in the state
    * store. Run with outputMode complete (register-table-sized) or update
    * (changed registers per batch; the sink folds by max). */
  def hllRegisterStream(stream: DataFrame, keys: Seq[String],
                        valueCol: String): DataFrame =
    Sketches.hllRegisters(stream, keys, valueCol)

  /** Live KMV/theta sketch per group over a stream — the distinct-count /
    * set-overlap companion to the HLL registers, with the same bounded-
    * state argument: the state store holds ONE ≤ k-longs buffer per group
    * (KmvMinKAgg's serialized TreeSet), never a row per distinct value,
    * and needs no watermark because the k-min-distinct merge is
    * associative, commutative and idempotent — the k smallest distinct
    * hashes of a set are a pure function of the set, so neither
    * micro-batch splits nor replays can change any snapshot. Feed any
    * sink snapshot to `ThetaSketch.withMeta` → `estimate`/`pairwiseOps`
    * for live cross-slice overlap (q125's algebra on streaming state). */
  def kmvSketchStream(stream: DataFrame, groupCol: String, valueCol: String,
                      k: Int, salt: String = "theta"): DataFrame =
    graft.operators.ThetaSketch.rawSketch(stream, groupCol, valueCol, k, salt)
}
