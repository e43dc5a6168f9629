package graft.operators

import org.apache.spark.sql.DataFrame

/** One-call deploy sizing for the corpus-specific constants the gate
  * entries keep as fixed literals (their DuckDB twins must inline the
  * identical values across SFs). A deploy sizes them from the corpus
  * instead:
  *
  *   - [[Dedup.autoJaccardCap]] — the df cap for capped n-gram Jaccard
  *     candidate generation, with the zero-loss guarantee at the
  *     threshold (one aggregation pass over the inverted index);
  *   - [[Dedup.minhashBanding]] — (bands, rows) for the LSH banding at
  *     the operator's Jaccard threshold (driver-side S-curve optimum,
  *     no data pass);
  *   - [[Vectors.autoGeoCells]] — the geometry-blocked graph's cell
  *     count at the C = √(nProbe·N) cost-model optimum (one count).
  *
  * Total sizing cost: two bounded actions (the cap statistic and the
  * vector count) + closed-form math — safe to run at every ingest or
  * memoize per corpus snapshot. SCALING.md "Sizing at deploy" documents
  * the recipe; SizingSpec composes all three against the operators on
  * the spec corpus.
  */
object Sizing {

  /** The sized constants for one corpus snapshot.
    * @param jaccardCap   df cap for `Dedup.ngramJaccard(maxDf = Some(_))`
    * @param bands×rows   LSH banding for the minhash index
    * @param geoCells     `Vectors.knnJoinGeo(kCells = _)` cell count
    */
  final case class Sized(jaccardCap: Long, bands: Int, rows: Int, geoCells: Int)

  /** Size every corpus-specific constant in one call.
    *
    * @param documents     corpus for the dedup family (doc_id, text)
    * @param embeddings    corpus for the graph family (vec_id, embedding)
    * @param jaccardThreshold  min Jaccard of the n-gram dedup deploy
    * @param minhashThreshold  min Jaccard of the MinHash dedup deploy
    * @param nProbe        probe width of the geometry-blocked graph
    */
  def forCorpus(documents: DataFrame, embeddings: DataFrame,
                jaccardThreshold: Double = 0.3,
                minhashThreshold: Double = 0.7,
                nProbe: Int = 2): Sized = {
    val cap = Dedup.autoJaccardCap(documents, minJaccard = jaccardThreshold)
    val (b, r) = Dedup.minhashBanding(minhashThreshold)
    val cells = Vectors.autoGeoCells(embeddings, nProbe)
    Sized(cap, b, r, cells)
  }
}
