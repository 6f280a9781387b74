package graft.core

/** Distance metric enum, mirroring the reference's `Metric`
  * (`/root/reference/vicinity/utils.py:58-91`), including its string alias
  * table — note `"dot"` resolves to Cosine, exactly as the reference does.
  */
sealed abstract class Metric(val name: String) extends Serializable
object Metric {
  case object Cosine       extends Metric("cosine")
  case object Euclidean    extends Metric("euclidean")
  case object Manhattan    extends Metric("manhattan")
  case object InnerProduct extends Metric("inner_product")
  case object L2Squared    extends Metric("l2sq")
  case object Hamming      extends Metric("hamming")
  case object Tanimoto     extends Metric("tanimoto")

  val all: Seq[Metric] =
    Seq(Cosine, Euclidean, Manhattan, InnerProduct, L2Squared, Hamming, Tanimoto)

  /** Alias table per `/root/reference/vicinity/utils.py:73-87`. */
  private val aliases: Map[String, Metric] = Map(
    "cos"          -> Cosine,
    "cosine"       -> Cosine,
    "dot"          -> Cosine,
    "euclidean"    -> Euclidean,
    "l2"           -> Euclidean,
    "manhattan"    -> Manhattan,
    "l1"           -> Manhattan,
    "inner_product" -> InnerProduct,
    "ip"           -> InnerProduct,
    "l2sq"         -> L2Squared,
    "l2_squared"   -> L2Squared,
    "hamming"      -> Hamming,
    "tanimoto"     -> Tanimoto
  )

  def fromString(s: String): Metric =
    aliases.getOrElse(s.toLowerCase,
      throw new IllegalArgumentException(s"Unsupported metric: $s"))
}
