package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the clustering step
  * that turns near-duplicate *pairs* (MinHash/SimHash/embedding-cosine, see
  * [[Dedup]] / [[Similarity]]) into duplicate *clusters*, so a corpus keeps
  * exactly one representative per transitive group (reference behavior is
  * per-pair only; this is the standard completion for corpus-level dedup).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * two shuffles (a groupBy per star step); convergence is O(log² n) rounds
  * on adversarial graphs and 2-4 rounds on real near-dup graphs — unlike
  * naive min-label propagation, which needs O(graph diameter) rounds and
  * dies on long chains at 100 TB scale. Iteration state is a plain edge
  * DataFrame, `localCheckpoint`ed each round to truncate lineage (on a real
  * cluster: `checkpoint` to durable storage); convergence is detected with
  * an order-independent checksum aggregate, one tiny action per round, no
  * driver-side data movement.
  */
object Components {

  /** Large-star: for every node u, link all strictly-larger neighbors to
    * the minimum of u's neighborhood (including u itself). Keeps every
    * edge's component connected while pointing big ids at small ids. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"),
        collect_set(col("dst")).as("nbrs"))
      .select(col("m"), explode(col("nbrs")).as("v"), col("src"))
      .where(col("v") > col("src"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: orient each edge (big, small); every big node links its
    * small neighbors (and itself) to the minimum among them. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    oriented.groupBy(col("src"))
      .agg(min(col("dst")).as("m"), collect_set(col("dst")).as("nbrs"))
      .select(col("m"), col("src"),
        explode(concat(col("nbrs"), array(col("src")))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Order-independent checksum of an edge set (one scalar action).
    * bit_xor, not sum: xor never overflows under ANSI mode. */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)),
      count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Connected components of the undirected graph given by (srcCol, dstCol)
    * pairs. Returns one row per node that appears in any edge:
    * (id, component) with component = the minimum node id in the group.
    *
    * Self-loops are ignored; the input may contain duplicates either way
    * round. `maxIter` is a safety bound — the algorithm provably converges,
    * typically in < 5 rounds.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 25): DataFrame = {
    var edges = pairs
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var prev = checksum(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      edges = next
      it += 1
    }
    // Fixpoint is a star forest: every edge is (member, root). Roots map to
    // themselves; members to their root.
    val roots = edges.select(col("dst")).distinct()
      .join(edges.select(col("src")).distinct(), col("dst") === col("src"), "left_anti")
      .select(col("dst").as("id"), col("dst").as("component"))
    edges.select(col("src").as("id"), col("dst").as("component"))
      .unionAll(roots)
      .distinct()
  }

  /** Cluster summary: one row per component with its size and id range. */
  def clusterSizes(components: DataFrame): DataFrame =
    components.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
}
