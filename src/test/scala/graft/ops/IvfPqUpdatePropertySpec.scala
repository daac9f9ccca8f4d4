package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of [[Similarity.updateIvfPqIndex]]'s CDC
  * bookkeeping under RANDOM deltas that hit multiple inverted lists at
  * once: after an upsert/delete batch the index must contain exactly
  * (original ∪ added-ids) ∖ removed, rows untouched by the delta must
  * keep their exact codes (their partitions were either rewritten
  * verbatim or never touched), and replayed/overlapping deltas must not
  * duplicate rows. The coding MATH is value-oracled by q133; this spec
  * hammers the partition-overwrite row accounting the oracle only sees
  * one instance of. Fixed seeds keep CI deterministic.
  */
class IvfPqUpdatePropertySpec extends SparkSpec {
  import spark.implicits._

  private def grid(seed: Long, i: Int, j: Int): Float =
    (((seed * 31 + i) * 31 + j) % 7).toFloat / 7.0f

  private def vecsOf(seed: Long, ids: Seq[Long]): Seq[(Long, Array[Float])] =
    ids.map(id => id -> Array.tabulate(8)(j => grid(seed, id.toInt, j)))

  test("random multi-list deltas: exact id bookkeeping, untouched codes " +
    "stable, overlap-safe") {
    for (seedNo <- 0 until 3) {
      val n = 20 + seedNo * 7
      val base = vecsOf(seedNo, 0L until n.toLong)
      val df = base.toDF("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("ivfpq_prop").toString
      val coarse = Similarity.ivfCentroids(df, "vec_id", "embedding",
        k = 3, iters = 3)
      Similarity.buildIvfPqIndex(df, "vec_id", "embedding", coarse, dir,
        dim = 8, m = 4, kCent = 4, iters = 2)
      val before = Similarity.readLists(spark, dir)
        .collect().map(r => r.getAs[Long]("id") -> r.toString).toMap

      val pick = Gen.someOf(0L until n.toLong)
      val removedIds = pick(Gen.Parameters.default, Seed(seedNo * 2 + 1L))
        .get.toSet
      val upsertIds = pick(Gen.Parameters.default, Seed(seedNo * 2 + 2L))
        .get.toSet
      val newIds = (100L until 100L + 3 + seedNo).toSet
      // upserts use DIFFERENT vectors (seed shifted) so replaced rows
      // must change; overlap with removedIds is allowed — upsert wins
      // (the added anti-join runs after the removed one)
      val added = vecsOf(seedNo + 99, (upsertIds ++ newIds).toSeq.sorted)
      Similarity.updateIvfPqIndex(spark, dir,
        added.toDF("vec_id", "embedding"),
        removedIds.toSeq.toDF("vec_id"),
        "vec_id", "embedding", dim = 8, m = 4)

      val after = Similarity.readLists(spark, dir)
        .collect().map(r => r.getAs[Long]("id") -> r.toString).toMap
      val expectIds =
        ((0L until n.toLong).toSet -- removedIds -- upsertIds) ++
          upsertIds ++ newIds
      assert(after.keySet == expectIds,
        s"seed=$seedNo removed=$removedIds upserts=$upsertIds")
      // untouched ids (not removed, not upserted) keep exact rows
      val untouched = (0L until n.toLong).toSet -- removedIds -- upsertIds
      untouched.foreach { id =>
        assert(after(id) == before(id), s"seed=$seedNo id=$id row changed")
      }
      // determinism: re-applying the same delta changes nothing
      Similarity.updateIvfPqIndex(spark, dir,
        added.toDF("vec_id", "embedding"),
        removedIds.toSeq.toDF("vec_id"),
        "vec_id", "embedding", dim = 8, m = 4)
      val again = Similarity.readLists(spark, dir)
        .collect().map(r => r.getAs[Long]("id") -> r.toString).toMap
      assert(again == after, s"seed=$seedNo re-apply drifted")
    }
  }
}
