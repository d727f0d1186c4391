package graft

/** Fixed 64-dim probe vectors for the declared vector-search queries.
  *
  * One definition feeds BOTH the Spark Column literal
  * (`VectorFunctions.vecLit`) and the DuckDB oracle SQL text (`sql`), so
  * the two engines always parse bit-identical doubles: every component is
  * an exact one-decimal value, printed with `%.1f`.
  */
object QueryVectors {
  val dim = 64

  /** deterministic, mixed-sign, exact-decimal components */
  val q1: IndexedSeq[Double] = (0 until dim).map(i => ((i * 7 + 3) % 13 - 6) / 10.0)
  val q2: IndexedSeq[Double] = (0 until dim).map(i => ((i * 5 + 1) % 11 - 5) / 10.0)

  private def fmt(d: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, d)

  /** DuckDB literal: `[0.3,-0.2,...]::DOUBLE[]` */
  def sql(v: Seq[Double]): String = v.map(fmt).mkString("[", ",", "]") + "::DOUBLE[]"
}
