package graft.core

/** Backend identifiers, mirroring the reference's `Backend` enum
  * (`/root/reference/vicinity/datatypes.py:20-27`). The reference has 7
  * native-library backends; our engine keeps the full surface but maps them
  * onto three physical Spark strategies (SURVEY.md §2.3):
  *
  *  - EXACT  — brute-force distance + per-query top-k (reference BASIC /
  *             FAISS-flat semantics)
  *  - LSH    — random-hyperplane sign-LSH buckets (ANNOY / FAISS-lsh family)
  *  - IVF    — KMeans centroids + nprobe partition pruning (FAISS-ivf family)
  *
  * HNSW-family backends (hnsw/usearch/voyager/pynndescent) are served by the
  * LSH strategy: identical query semantics (top-k / threshold), different
  * recall/speed trade-off — see SURVEY.md §2.3 capability-equivalence note.
  */
sealed abstract class Backend(val name: String) extends Serializable
object Backend {
  case object Basic       extends Backend("basic")
  case object Hnsw        extends Backend("hnsw")
  case object Annoy       extends Backend("annoy")
  case object Pynndescent extends Backend("pynndescent")
  case object Faiss       extends Backend("faiss")
  case object Usearch     extends Backend("usearch")
  case object Voyager     extends Backend("voyager")

  val all: Seq[Backend] =
    Seq(Basic, Hnsw, Annoy, Pynndescent, Faiss, Usearch, Voyager)

  def fromString(s: String): Backend =
    all.find(_.name == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"Unknown backend: $s"))
}

/** Per-backend hyperparameter records, mirroring the reference's `BaseArgs`
  * dataclass family (`/root/reference/vicinity/backends/base.py:15-39` and
  * each backend's `*Args`). Serialized to `arguments.json` on save for
  * directory-format parity (`base.py:19-32`).
  */
sealed trait BackendArgs extends Serializable {
  def metric: Metric
  def toJsonFields: Map[String, Any]
}
object BackendArgs {
  /** `basic.py:17-18` */
  case class BasicArgs(metric: Metric = Metric.Cosine) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name)
  }
  /** `hnsw.py:15-21` */
  case class HnswArgs(metric: Metric = Metric.Cosine, efConstruction: Int = 200,
      m: Int = 16) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name,
      "ef_construction" -> efConstruction, "m" -> m)
  }
  /** `annoy.py:16-22` */
  case class AnnoyArgs(metric: Metric = Metric.Cosine, trees: Int = 100,
      length: Option[Long] = None) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name, "trees" -> trees,
      "length" -> length.getOrElse(null))
  }
  /** `pynndescent.py:17-19` */
  case class PynndescentArgs(metric: Metric = Metric.Cosine,
      nNeighbors: Int = 15) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name, "n_neighbors" -> nNeighbors)
  }
  /** `faiss.py:35-43`; `indexType` one of flat/ivf/hnsw/lsh/scalar/pq/
    * ivf_scalar/ivfpq/ivfpqr (`faiss.py:87-114`). */
  case class FaissArgs(metric: Metric = Metric.Cosine, indexType: String = "flat",
      nlist: Int = 100, m: Int = 8, nbits: Int = 8,
      refineNbits: Int = 8) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name, "index_type" -> indexType,
      "nlist" -> nlist, "m" -> m, "nbits" -> nbits, "refine_nbits" -> refineNbits)
  }
  /** `usearch.py:17-23` */
  case class UsearchArgs(metric: Metric = Metric.Cosine, connectivity: Int = 16,
      expansionAdd: Int = 128, expansionSearch: Int = 64) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name, "connectivity" -> connectivity,
      "expansion_add" -> expansionAdd, "expansion_search" -> expansionSearch)
  }
  /** `voyager.py:15-20` */
  case class VoyagerArgs(metric: Metric = Metric.Cosine, efConstruction: Int = 200,
      m: Int = 16) extends BackendArgs {
    def toJsonFields = Map("metric" -> metric.name,
      "ef_construction" -> efConstruction, "m" -> m)
  }

  def defaultFor(backend: Backend): BackendArgs = backend match {
    case Backend.Basic       => BasicArgs()
    case Backend.Hnsw        => HnswArgs()
    case Backend.Annoy       => AnnoyArgs()
    case Backend.Pynndescent => PynndescentArgs()
    case Backend.Faiss       => FaissArgs()
    case Backend.Usearch     => UsearchArgs()
    case Backend.Voyager     => VoyagerArgs()
  }
}
