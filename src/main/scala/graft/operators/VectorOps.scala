package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector storage transforms for ANN at scale.
  *
  * The reference stores raw f32 vectors (`src/types/vector.rs:8-9`); at
  * 100 TB the standard memory lever is symmetric per-vector int8
  * quantization (4× smaller posting lists, SIMD-friendly dot products) —
  * the simplest member of the PQ/SQ family. Everything here is a pure
  * Catalyst expression: map-only, codegen-friendly, and reproducible
  * 1:1 in the DuckDB oracle (all arithmetic in double, round-half-up via
  * `floor(x + 0.5)` — the same convention as [[graft.Queries]]'s r4).
  */
object VectorOps {

  /** Per-vector symmetric scale: `max(|x_i|) / 127` — the dequant factor
    * mapping int8 [-127, 127] back to the vector's value range. Zero for
    * an all-zero vector (handled by [[quantizeInt8]]). */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)

  /** Symmetric int8 quantization: `q_i = round_half_up(x_i / scale)`,
    * clamped implicitly to [-127, 127] by the scale choice; an all-zero
    * vector (scale 0) quantizes to zeros instead of NaN-poisoning. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale > 0, floor(x.cast("double") / scale + lit(0.5)).cast("int"))
        .otherwise(lit(0)))

  /** Dequantization: `q_i * scale` (double). Reconstruction error is
    * bounded by `scale / 2` per element — asserted in VectorOpsSpec. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
