package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-derived ±1 random projection (Achlioptas 2003) on the exact
  * integer grid — the cheap JL-style dimensionality reducer used to
  * prefilter similarity search before exact re-ranking.
  *
  * The sign matrix is NOT random state: s(d, j) = parity of the
  * portable 60-bit md5 hash of the string "rp:d:j" — a PUBLIC
  * derivation both engines compute independently (the re-learning
  * ethos applied to randomness: nothing crosses engines, and the
  * matrix is reproducible forever from the seed string alone). With
  * ±1 entries, E[‖Rx‖²] = k·‖x‖², so projected squared distances
  * estimate k× the original — both sides exact BIGINTs here, so the
  * estimate QUALITY itself is measurable exactly.
  *
  * Scale shape: projection is a pure per-row fold (the k sign rows
  * fold in as literals); nothing shuffles.
  */
object RandomProjection {

  /** md5-parity sign, identical to the oracle's
    * `CASE WHEN hash60('rp:' || d || ':' || j) % 2 = 0 THEN 1 ELSE -1`.
    */
  private[graft] def sign(d: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = md.digest(s"rp:$d:$j".getBytes("UTF-8"))
    var acc = 0L
    var b = 0
    while (b < 8) { acc = (acc << 8) | (bytes(b) & 0xffL); b += 1 }
    if ((acc >>> 4) % 2 == 0) 1L else -1L
  }

  /** The k sign rows for a `dim`-dimensional input (row j = the signs
    * multiplying each input coordinate for output coordinate j).
    */
  def signMatrix(dim: Int, k: Int): Seq[Seq[Long]] =
    (1 to k).map(j => (1 to dim).map(d => sign(d, j)))

  /** Projected micro vectors: (vec_id, z) with z_j = Σ_d x_d·s(d, j),
    * exact BIGINTs over the micro grid.
    */
  def project(emb: DataFrame, k: Int, dim: Int = 64): DataFrame = {
    val rows = signMatrix(dim, k)
    val zs: Seq[Column] = rows.map { signs =>
      aggregate(zip_with(col("m"), typedLit(signs), (a, b) => a * b),
        lit(0L), (acc, t) => acc + t)
    }
    KMeans.micro(emb).select(col("vec_id"), array(zs: _*).as("z"))
  }
}
