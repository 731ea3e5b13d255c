package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage at scale: a 100 TB corpus's
  * float32 vectors are the single largest ANN-index input, and
  * symmetric per-vector int8 cuts them 4x with a bounded, auditable
  * reconstruction error (|err| <= scale/2 per element by construction
  * — QuantizeSpec asserts it). All pure per-row expression work: no
  * shuffle, rides the scan, codegen'd end to end.
  *
  * Determinism contract (what makes the audit oracle-able): every
  * element is CAST to double first (float->double is exact), the scale
  * is max|v|/127 (an order-free max, never a sum), and the rounding is
  * the explicit `floor(x/scale + 0.5)` — not the engine `round`, whose
  * tie-breaking differs between engines. Same formula, same doubles,
  * any engine.
  */
object Quantize {

  private def dbl(vecCol: String): Column =
    transform(col(vecCol), x => x.cast("double"))

  /** Adds `scale` (double) and `q` (array<int>, all in [-127, 127]):
    * q_i = floor(v_i/scale + 0.5). A zero vector quantizes to zeros at
    * scale 0 rather than dividing by it. Dequantize is q_i * scale.
    */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = dbl(vecCol)
    val scale = array_max(transform(v, abs(_))) / lit(127.0)
    df.withColumn("scale", scale)
      .withColumn("q",
        when(col("scale") === 0.0,
          transform(dbl(vecCol), _ => lit(0)))
        .otherwise(transform(dbl(vecCol),
          x => floor(x / col("scale") + 0.5).cast("int"))))
  }

  /** The reconstruction audit over [[int8]]: per-vector quantized range
    * and the max absolute dequantization error — order-free maxima
    * only, so the numbers replay exactly on any engine.
    */
  def int8Audit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = dbl(vecCol)
    val scale = array_max(transform(v, abs(_))) / lit(127.0)
    val err = (x: Column, s: Column) =>
      abs(x - floor(x / s + lit(0.5)) * s)
    // the raw scale must NOT be named "scale" here: the output select
    // aliases the rounded value "scale", and lateral column alias
    // resolution (default-on since Spark 3.4) would silently rebind the
    // error expressions to the ROUNDED scale — a ~1e-7 drift the hash
    // gate caught on first run
    df.select(col(idCol), v.as("v"), scale.as("s_raw"))
      .select(col(idCol),
        round(col("s_raw"), 9).as("scale"),
        size(col("v")).cast("long").as("n_dims"),
        when(col("s_raw") === 0.0, lit(0L)).otherwise(
          array_min(transform(col("v"),
            x => floor(x / col("s_raw") + 0.5))).cast("long")).as("qmin"),
        when(col("s_raw") === 0.0, lit(0L)).otherwise(
          array_max(transform(col("v"),
            x => floor(x / col("s_raw") + 0.5))).cast("long")).as("qmax"),
        when(col("s_raw") === 0.0, lit(0.0)).otherwise(
          round(array_max(transform(col("v"), x => err(x, col("s_raw")))), 9))
          .as("max_abs_err"))
  }
}
