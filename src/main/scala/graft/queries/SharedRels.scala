package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.T
import graft.ops.Dedup

/** Session-scoped shared derived relations — the materialized-view layer
  * of the query registry.
  *
  * Eleven graph/dedup registry queries consume the SAME near-dup pair
  * relation (MinHash-LSH pairs over the doc_id < 500 documents slice at
  * threshold 0.5) before running their own kernel. Re-deriving it per
  * query re-runs the full shingle → signature → band-join → verify
  * pipeline each time — the single biggest repeated cost in the bench
  * (r10 verdict item 4). At production scale the same relation would be
  * a materialized table maintained by the dedup pipeline and READ by the
  * graph jobs, not recomputed per query; this cache is the in-session
  * analogue: first consumer materializes (localCheckpoint), later
  * consumers read the checkpointed blocks.
  *
  * Correctness: the fixture IS `Dedup.minHashLshPairs(docs, 0.5)` — same
  * rows, same values — so every consumer's oracle hash is unchanged; the
  * DuckDB oracle replays the derivation independently per query.
  *
  * Lifecycle: entries are keyed by (session, sf dir). A consumer checks
  * that the checkpointed blocks still exist (an unpersist would truncate
  * the lineage AND drop the blocks, making the cached plan unreadable)
  * and rebuilds if not. [[liveRddIds]] exposes the backing RDD ids so
  * `Bench`'s between-query unpersist sweep can skip fixture blocks.
  */
object SharedRels {

  private final case class Key(session: SparkSession, dir: String,
      tag: String)
  private final case class Entry(df: DataFrame, rddIds: Set[Int])

  private val cache = scala.collection.mutable.HashMap.empty[Key, Entry]

  /** RDD ids backing live fixtures of this session — blocks that a
    * between-query cleanup sweep must NOT unpersist. */
  def liveRddIds(spark: SparkSession): Set[Int] = synchronized {
    cache.collect { case (Key(s, _, _), e) if s eq spark => e.rddIds }
      .flatten.toSet
  }

  /** Drop all fixtures of one session (frees the checkpoint blocks). */
  def clear(spark: SparkSession): Unit = synchronized {
    cache.filterInPlace { case (Key(s, _, _), e) =>
      if (s eq spark) {
        e.rddIds.foreach(id =>
          spark.sparkContext.getPersistentRDDs.get(id)
            .foreach(_.unpersist(blocking = false)))
        false
      } else true
    }
  }

  /** The memoization kernel every fixture shares: first consumer runs
    * `build` and localCheckpoints it, later consumers get the cached
    * frame — after verifying its checkpoint blocks still exist (an
    * unpersist truncates the lineage AND drops the blocks, making the
    * cached plan unreadable), rebuilding if not. */
  private def memo(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = synchronized {
    val key = Key(spark, dir, tag)
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    cache.get(key) match {
      case Some(e) if e.rddIds.subsetOf(persisted) => e.df
      case _ =>
        // Track ONLY the final checkpoint's blocks: a build may create
        // its own internal localCheckpoints (the GD fixture's feature/
        // label frames), which go out of scope once the final frame is
        // materialized and are then legitimately reclaimed by the
        // ContextCleaner (or the bench's between-query sweep). Counting
        // them in rddIds made the validity check fail on their
        // reclamation and silently rebuild the fixture every few
        // consumers — the final frame's own blocks are all a reader
        // needs, and the cached reference keeps THEM alive.
        val built = build
        val mid = spark.sparkContext.getPersistentRDDs.keySet
        val df = built.localCheckpoint()
        val ids = spark.sparkContext.getPersistentRDDs.keySet.diff(mid)
        cache.update(key, Entry(df, ids.toSet))
        df
    }
  }

  /** The shared near-dup pair relation: MinHash-LSH pairs (id_a, id_b,
    * jaccard) over the doc_id < 500 documents slice at threshold 0.5 —
    * byte-identical to calling
    * `Dedup.minHashLshPairs(documents.filter(doc_id < 500), 0.5)`. */
  def nearDupPairs500(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "nearDupPairs500") {
      // T.par before the pipeline: the slice is a handful of input
      // splits; the CPU-heavy shingle/signature stages need all
      // cores. Row set (and therefore every consumer's hash) is
      // unaffected by partitioning.
      Dedup.minHashLshPairs(
        T.par(spark, T.t(spark, dir, "documents"))
          .filter(col("doc_id") < 500),
        threshold = 0.5)
    }

  /** Documents with the is-English gold label the quality/GD family
    * trains against (the `quality_pr_curve` convention). Not cached —
    * it is one projection over the table scan. */
  def labeledDocs(spark: SparkSession, dir: String): DataFrame =
    T.par(spark, T.t(spark, dir, "documents"))
      .withColumn("label", (col("lang") === "en").cast("int"))

  /** The shared exact-GD epoch relation over [[labeledDocs]]
    * (dim 64, lr = 1/lrDen): byte-identical to
    * `QualityModel.logisticEpochScoresMicro(labeledDocs, 64, iters, 1,
    * lrDen)`. Eight registry queries aggregate this SAME relation
    * (cartography, forgetting, data-diet, ECE, Brier, GD/group curves,
    * TracIn self-influence) — at production scale it is the
    * materialized per-epoch score table the training-dynamics jobs
    * read, not something each readout re-trains; this cache is the
    * in-session analogue (the [[nearDupPairs500]] rationale). */
  def gdEpochScores(spark: SparkSession, dir: String, iters: Int,
      lrDen: Long): DataFrame =
    memo(spark, dir, s"gdEpochScores:$iters:$lrDen") {
      graft.ops.QualityModel.logisticEpochScoresMicro(
        labeledDocs(spark, dir), dim = 64, iters = iters,
        lrNum = 1L, lrDen = lrDen)
    }

  /** The shared hashed bag-of-words feature relation over
    * [[labeledDocs]] (dim 64) — the GD family's gradient/norm input:
    * byte-identical to `QualityModel.hashedFeatures(labeledDocs, 64)`. */
  def gdFeatures(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "gdFeatures") {
      graft.ops.QualityModel.hashedFeatures(labeledDocs(spark, dir), 64)
    }
}
