package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftShims

import graft.core.Metric

/** Column-level surface for the distance/normalize kernel family, plus SQL
  * function registration so the kernels are usable from `spark.sql(...)`.
  */
object VectorFunctions {

  private def col(e: Expression): Column = GraftShims.column(e)
  private def ex(c: Column): Expression = GraftShims.expression(c)

  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))
  def cosine_distance(a: Column, b: Column): Column = col(CosineDistance(ex(a), ex(b)))
  def euclidean_distance(a: Column, b: Column): Column = col(EuclideanDistance(ex(a), ex(b)))
  def manhattan_distance(a: Column, b: Column): Column = col(ManhattanDistance(ex(a), ex(b)))
  def inner_product_distance(a: Column, b: Column): Column = col(InnerProductDistance(ex(a), ex(b)))
  def l2sq_distance(a: Column, b: Column): Column = col(L2SquaredDistance(ex(a), ex(b)))
  def hamming_distance(a: Column, b: Column): Column = col(HammingDistance(ex(a), ex(b)))
  def tanimoto_distance(a: Column, b: Column): Column = col(TanimotoDistance(ex(a), ex(b)))
  def l2_normalize(a: Column): Column = col(L2Normalize(ex(a)))
  def winnow_md5(a: Column, window: Int): Column = col(WinnowMd5(ex(a), window))
  def pack_sign_bits(a: Column): Column = col(PackSignBits(ex(a)))
  def hamming_packed(a: Column, b: Column): Column = col(HammingPacked(ex(a), ex(b)))

  /** Metric-dispatched distance, mirroring the reference's `_dist` hook
    * (`/root/reference/vicinity/backends/basic.py:112-115`). */
  def distance(metric: Metric)(a: Column, b: Column): Column = metric match {
    case Metric.Cosine       => cosine_distance(a, b)
    case Metric.Euclidean    => euclidean_distance(a, b)
    case Metric.Manhattan    => manhattan_distance(a, b)
    case Metric.InnerProduct => inner_product_distance(a, b)
    case Metric.L2Squared    => l2sq_distance(a, b)
    case Metric.Hamming      => hamming_distance(a, b)
    case Metric.Tanimoto     => tanimoto_distance(a, b)
  }

  /** Register all kernels in the session's function registry (idempotent),
    * making them available to SQL: e.g.
    * `SELECT cosine_distance(a.embedding, b.embedding) FROM ...`.
    */
  def register(spark: SparkSession): Unit = {
    def reg2(name: String, f: (Expression, Expression) => Expression): Unit =
      GraftShims.registerFunction(spark, name, es => f(es(0), es(1)))
    reg2("dot_product", DotProduct)
    reg2("cosine_distance", CosineDistance)
    reg2("euclidean_distance", EuclideanDistance)
    reg2("manhattan_distance", ManhattanDistance)
    reg2("inner_product_distance", InnerProductDistance)
    reg2("l2sq_distance", L2SquaredDistance)
    reg2("hamming_distance", HammingDistance)
    reg2("tanimoto_distance", TanimotoDistance)
    reg2("hamming_packed", HammingPacked)
    GraftShims.registerFunction(spark, "l2_normalize", es => L2Normalize(es.head))
    GraftShims.registerFunction(spark, "pack_sign_bits", es => PackSignBits(es.head))
    GraftShims.registerFunction(spark, "winnow_md5", winnowBuilder)
  }

  /** SQL builder for the winnowing fingerprint: `winnow_md5(text[, width])`
    * — width must be a foldable int literal (it shapes the generated code) */
  private[graft] def winnowBuilder(es: Seq[Expression]): Expression =
    es match {
      case Seq(t) => WinnowMd5(t)
      case Seq(t, w) =>
        require(w.foldable, "winnow_md5 width must be a literal")
        val width = w.eval() match {
          case n: java.lang.Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"winnow_md5 width must be an integer literal, got $other")
        }
        require(width >= 1, s"winnow_md5 width must be >= 1, got $width")
        WinnowMd5(t, width)
      case _ => throw new IllegalArgumentException(
        "winnow_md5 expects (text[, width])")
    }
}
