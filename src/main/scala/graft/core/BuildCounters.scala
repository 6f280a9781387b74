package graft.core

/** Process-global counters for one-time index-build work (verdict r12
  * #1b: the driver's bench showed the KMeans-training families 4-8×
  * slower than the builder's run at the same HEAD, and the artifact
  * could not say whether cached registry indexes had silently RE-TRAINED
  * in the timed pass after memory-pressure eviction, or the machine was
  * just busy). Every codebook/range/rotation training increments
  * [[trainings]]; the bench snapshots it around each timed run and ships
  * any non-zero delta in the artifact (`timed_trainings`), so
  * "re-training leaked into the timed pass" is decidable from the JSON
  * alone. Structurally the count should always be 0 there: training runs
  * only when a strategy's learned state is null, strategies live in the
  * session registry for the whole run, and prepared frames cache at
  * MEMORY_AND_DISK (eviction spills, it does not recompute).
  */
object BuildCounters {
  val trainings = new java.util.concurrent.atomic.AtomicLong(0L)
}
