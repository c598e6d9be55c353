package graft

import org.apache.spark.sql.SparkSession

/** Test-side brute-force reconstruction of the [[graft.queries.Graphs]]
  * kNN graph: micro-quantized dots, top-5 per source with (dot DESC,
  * dst ASC) tiebreak, symmetrized undirected edge set. */
object BruteKnn {
  def undirectedEdges(spark: SparkSession, sf: String): Set[(Long, Long)] = {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray))
    def dot(p: Array[Long], q: Array[Long]): Long =
      p.zip(q).map { case (x, y) => x * y }.sum
    val edges = scala.collection.mutable.Set[(Long, Long)]()
    for ((src, p) <- em) {
      val top = em.filter(_._1 != src)
        .map { case (dst, q) => (dot(p, q), dst) }
        .sortBy { case (s0, dst) => (-s0, dst) }.take(5)
      for ((_, dst) <- top) edges += ((math.min(src, dst),
        math.max(src, dst)))
    }
    edges.toSet
  }
}
