package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differentially-private release mechanisms — the noisy-aggregate tier
  * of the privacy suite (k-anonymity/l-diversity/pseudonymization are
  * structural; a DP release perturbs the published VALUES so the
  * presence of any single row is ε-deniable).
  *
  * The noise is the two-sided geometric ("discrete Laplace") mechanism
  * with ratio α = 1/2, i.e. P(Z = k) = (1/3)·2^{−|k|}, which for a
  * sensitivity-1 count gives ε = ln 2 per release. α = 1/2 is chosen
  * for REPLAYABILITY, not convenience: the inverse-CDF thresholds
  * become pure powers of two — F(k)·3·2^41 = 3·2^41 − 2^{41−k} for
  * k ≥ 0 and 2^{42+k} for k < 0 — so the draw is exact INTEGER
  * arithmetic (msb positions via `length(bin(x))`, never a float log),
  * and a DuckDB oracle replays every noisy value bit-for-bit from the
  * same seeded md5: the q184-clock discipline applied to a privacy
  * mechanism. Noise is truncated to |Z| ≤ 41 (tail mass (2/3)·2^−41,
  * folded into the extremes — the standard bounded-geometric release;
  * truncation only LOWERS the likelihood ratio between neighbors at the
  * folded extremes, so the ε accounting stands).
  *
  * Seeding: `u = md5(seed:key) mod 3·2^41` from 15 hex chars (60 bits),
  * so the modulo bias is ≤ 2^−17 — irrelevant for parity (both engines
  * replay the same u) and negligible against the release's ε.
  */
object Privacy {

  /** 3·2^41 — the exact-threshold scale of the α=1/2 mechanism. */
  val GeomScale: Long = 3L * (1L << 41)

  /** ε of one sensitivity-1 release under this mechanism, in floor-ppm:
    * ln 2 = 0.693147…
    */
  val EpsilonLn2Ppm: Long = 693147L

  /** Adds `out`: two-sided geometric noise (α = 1/2) in [−41, 41] as a
    * pure function of (seed, keySql). `keySql` must be a deterministic
    * per-bucket STRING expression (SQL text over `df`'s columns) so the
    * draw replays on any engine that shares the md5.
    *
    * Both inputs are spliced into SQL text, and a privacy mechanism
    * whose correctness contract is bit-exact replay cannot afford a
    * silently-altered draw — so both are validated: the seed must be a
    * plain `[A-Za-z0-9_-]+` token (a quote or colon would change the
    * md5 preimage or break parsing), and `keySql` must not reference
    * the transient `_dp_u` working column this function owns.
    */
  def withTwoSidedGeometricNoise(df: DataFrame, seed: String,
      keySql: String, out: String): DataFrame = {
    require(seed.matches("[A-Za-z0-9_-]+"),
      s"DP seed must match [A-Za-z0-9_-]+ (got '$seed'): quotes/colons " +
        "would silently alter the spliced md5 preimage")
    require(!keySql.contains("_dp_u"),
      "keySql must not reference the transient _dp_u working column")
    val mid = 1L << 42 // F(0)·scale
    df.withColumn("_dp_u", expr(
        s"CAST(conv(substring(md5(concat('$seed:', $keySql)), 1, 15), " +
          s"16, 10) AS BIGINT) % ${GeomScale}L"))
      .withColumn(out, expr(
        s"""CAST(CASE
           |  WHEN _dp_u = 0 THEN -41
           |  WHEN _dp_u < ${mid}L THEN length(bin(_dp_u)) - 42
           |  WHEN ${GeomScale - 1}L - _dp_u = 0 THEN 41
           |  ELSE 42 - length(bin(${GeomScale - 1}L - _dp_u))
           |END AS BIGINT)""".stripMargin))
      .drop("_dp_u")
  }
}
