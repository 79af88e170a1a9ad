package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by min-label propagation — the
  * production dedup step AFTER near-dup pair verification: pairs form
  * an undirected graph; every document takes the smallest doc id
  * reachable through it (its cluster's canonical survivor).
  *
  * Each iteration is one shuffle join + partial-aggregated min — the
  * Pregel/GraphFrames CC pattern without the dependency. Iteration
  * count ≈ component diameter, and near-dup clusters are shallow
  * (dupes of a common ancestor), so the loop converges in a handful
  * of supersteps at any corpus size. The driver-side `count()` per
  * step is an aggregate (a convergence check), never data collection.
  */
object ConnectedComponents {

  /** @param edgesIn (u, v) pairs, one row per undirected edge.
    * @return (id, label): label = min id of the component.
    */
  def labels(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.select(col("u"), col("v"))
      .union(edgesIn.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < 25) {
      // per node: min label among neighbors
      val nbrMin = edges.join(lab.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min(col("label")).as("nbr"))
      val next = lab.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = lab.withColumnRenamed("label", "prev").join(next, "id")
        .filter(col("label") =!= col("prev")).count()
      lab.unpersist(blocking = false)
      lab = next
      iter += 1
    }
    edges.unpersist(blocking = false)
    lab
  }
}
