package graft.core

/** SQL-text helpers for the repo's integerization discipline — the q02
  * "cents" recipe generalized after the r11 ml21 post-mortem.
  *
  * Oracle determinism requires three invariants:
  *   1. no cross-row DOUBLE aggregate over fractional values (float
  *      sums are order-dependent; Spark and DuckDB add in different
  *      orders) — integerize BEFORE the aggregate;
  *   2. no direct CAST of a >2⁵³ 128-bit integer (DECIMAL(38,0) /
  *      HUGEINT) to DOUBLE — the two engines' software conversions can
  *      differ by 1 ulp (the ml21 failure); go through [[dec2d]] or a
  *      fixed-point integral divide instead;
  *   3. no round(x, d) where x can sit EXACTLY on a d-dp rounding
  *      boundary (dyadic rationals like 15/128 = 0.1171875 are exactly
  *      representable and the engines' half-up vs nearest tie rules
  *      differ) — emit fixed-point integers, or the unrounded double
  *      when the chain is already bit-identical.
  *
  * Each helper renders the SAME SQL text for Spark and the DuckDB
  * mirror, with only the integral-divide token swapped (Spark `DIV`,
  * DuckDB `//`). RoundGuardSpec is the standing lint for the class.
  */
object Fixed {

  /** Spark's integral-divide token. */
  val SDIV = "DIV"

  /** DuckDB's integral-divide token. */
  val DDIV = "//"

  /** Exact cents of a 2-dp decimal stored as DOUBLE. round(x·100) is a
    * fixed-shape function of the identical stored double on both
    * engines, so the snap is deterministic even for doubles whose ·100
    * carries float dust (0.29·100 = 28.999…). */
  def cents(c: String): String = s"CAST(round(($c) * 100) AS BIGINT)"

  /** Sign-split integral divide: truncation toward zero on BOTH
    * engines. Spark `DIV` truncates, DuckDB `//` floors — they differ
    * on negative numerators, so the division is always taken on the
    * absolute value. `den` must be positive. */
  def sdiv(num: String, den: String, div: String): String =
    s"(CASE WHEN ($num) >= 0 THEN ($num) $div ($den) " +
      s"ELSE -((-($num)) $div ($den)) END)"

  /** Deterministic DOUBLE of a NON-NEGATIVE 128-bit integer
    * (DECIMAL(38,0) on Spark / HUGEINT in DuckDB) up to 2¹⁰⁶ ≈ 8·10³¹:
    * hi/lo split at 2⁵³ so every cast is of a ≤ 2⁵³ value — exactly
    * representable, hence no rounding and no engine ambiguity — then
    * one fixed-shape IEEE multiply-add (hi·2⁵³ is exact: power-of-two
    * scaling; the final + rounds nearest identically on both engines).
    * A direct CAST(… AS DOUBLE) of a > 2⁵³ 128-bit value is the r11
    * ml21 bug. */
  def dec2d(e: String, div: String): String =
    s"(CAST(($e) $div 9007199254740992 AS DOUBLE) * 9007199254740992.0 + " +
      s"CAST(($e) % 9007199254740992 AS DOUBLE))"

  /** [[dec2d]] for possibly-negative values (sign split first). */
  def sdec2d(e: String, div: String): String =
    s"(CASE WHEN ($e) >= 0 THEN ${dec2d(e, div)} " +
      s"ELSE -${dec2d(s"-($e)", div)} END)"
}
