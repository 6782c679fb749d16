package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.{FlatSearch, IVFSearch}

/** IVF flat index with add-time deduplication of identical vectors —
  * the reference's `IndexIVFFlatDedup` (`Auncel/IndexIVFFlat.h:62-108`,
  * `IndexIVFFlat.cpp:233-410`): each distinct vector is stored once per
  * list under its smallest instance id (the representative), and an
  * `instances` side table maps rep_id → every other id carrying the
  * same vector. Search scans unique vectors only and expands hits
  * through the map at the same distance; deletes drop instances and
  * promote a new representative when the stored copy goes away.
  *
  * Spark-first shape: the reference's per-add memcmp over the target
  * list (`IndexIVFFlat.cpp:295-305` — O(list length) per insert)
  * becomes ONE shuffle keyed on `(list_no, xxhash64(vec))` — an 8-byte
  * key instead of the raw d×4-byte vector — followed by a bit-exact
  * recheck (float raw bits, ≡ memcmp on the stored codes) inside each
  * hash bucket. Bit-level equality matches the reference exactly:
  * +0.0 and -0.0 stay SEPARATE (a plain `groupBy(vec)` would merge
  * them — Spark normalizes signed zeros/NaNs in grouping keys). The
  * instances map is a DataFrame (never driver-side); search expansion
  * joins it against the tiny unique top-k result broadcast.
  *
  * Expansion-order note: the reference expands through an unordered
  * multimap (`IndexIVFFlat.cpp:349-380` — hash order, run-dependent);
  * we expand id-ascending under the global (dist, id) tie-break, which
  * makes the result DETERMINISTIC and provably equal to flat top-k over
  * the full duplicated corpus (see [[search]]). Both fill k slots with
  * the same distances; ours pins WHICH duplicate ids fill ties.
  */
object IVFDedup {

  /** @param unique    (list_no, id, vec) — one row per distinct vector,
    *                  id = smallest instance id (the representative)
    * @param instances (rep_id, dup_id) — non-representative instance
    *                  ids; vectors with a single instance do not appear
    *                  (`IndexIVFFlat.h:63-66` contract) */
  final case class DedupIndex(unique: DataFrame, instances: DataFrame) {
    /** ntotal in reference terms: unique + duplicate instances. */
    def countTotal(): Long = unique.count() + instances.count()
  }

  /** Train the coarse quantizer on the deduplicated training set
    * (`IndexIVFFlatDedup::train`, `IndexIVFFlat.cpp:258-275`: trains on
    * distinct vectors so heavy duplication cannot skew the centroids). */
  def train(df: DataFrame, nlist: Int, metric: String = "l2",
            seed: Long = 42L, vecCol: String = "vec"): IVFModel =
    IVFIndex.train(df.dropDuplicates(vecCol), nlist, metric, seed, vecCol)

  /** Assign + dedup in one pass (`add_with_ids`,
    * `IndexIVFFlat.cpp:276-324`): rows with byte-identical vectors in
    * the same list collapse to the min-id representative; the rest
    * land in the instances map. */
  def build(df: DataFrame, model: IVFModel,
            vecCol: String = "vec"): DedupIndex =
    fromAssigned(IVFIndex.assign(df, model, vecCol)
      .select(col("list_no"), col("id").cast("long"), col(vecCol).as("vec")))

  /** Dedup an already-assigned (list_no, id, vec) table — the factory's
    * `IVF<n>,FlatDedup` path reuses its assigned frame directly.
    *
    * Shuffle shape at scale: the grouping key is `(list_no,
    * xxhash64(vec))` — 8 bytes per row instead of the raw d×4-byte
    * vector, so at 100 TB the build shuffle sorts/compares short keys
    * (the payload still carries the vector once; the output needs it).
    * Inside each hash bucket a bit-level recheck (`floatToRawIntBits`)
    * splits genuine collisions, giving exactly the reference's memcmp
    * semantics (`IndexIVFFlat.cpp:295-305`). flatMapGroups is
    * deserializing (non-codegen) but this is the one-time build path;
    * a bucket holds only the instances of one vector (plus ~0 hash
    * collisions), so per-group memory is the duplicate multiplicity. */
  def fromAssigned(assigned: DataFrame): DedupIndex = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val collapsed = assigned
      .select(col("list_no").cast("int"), col("id").cast("long"), col("vec"))
      .withColumn("vh", xxhash64(col("vec")))
      .as[(Int, Long, Array[Float], Long)]
      .groupByKey { case (listNo, _, _, vh) => (listNo, vh) }
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Array[Float], Long)]) =>
        val listNo = key._1
        it.toSeq
          .groupBy(_._3.map(java.lang.Float.floatToRawIntBits).toSeq)
          .valuesIterator
          .map { grp =>
            val ids = grp.map(_._2)
            (listNo, ids.min, grp.head._3, ids)
          }
      }
      .toDF("list_no", "id", "vec", "all_ids")
    val unique = collapsed.select(col("list_no"), col("id"), col("vec"))
    val instances = collapsed
      .select(col("id").as("rep_id"), explode(col("all_ids")).as("dup_id"))
      .filter(col("dup_id") =!= col("rep_id"))
    DedupIndex(unique, instances)
  }

  /** Top-k search with duplicate expansion
    * (`IndexIVFFlatDedup::search_preassigned`,
    * `IndexIVFFlat.cpp:326-380`): scan unique vectors via the standard
    * probed-list IVF path, then splice every hit's duplicate instances
    * in at the same distance and re-rank to k by (dist, id).
    *
    * Why this equals flat top-k over the duplicated corpus (full-probe
    * config): a vector's representative id IS its minimal instance id,
    * so for any expanded row in the global top-k, its rep row sorts no
    * later under (dist, id); if the rep missed the unique top-k there
    * would be k unique rows strictly ahead of it — hence ahead of the
    * expanded row too — a contradiction. So unique-top-k → expand →
    * re-rank loses nothing, and the v21 oracle can replay it as plain
    * brute force over the duplicated corpus.
    */
  def search(index: DedupIndex, model: IVFModel, queries: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    val uniq = IVFSearch.search(index.unique, model, queries, k, nprobe)
      .select(col("qid"), col("id"), col("dist"))
    // expansion: instances scanned once, filtered by a broadcast of the
    // tiny (nq × k) unique result — never collected, never crossed
    val dups = index.instances
      .join(broadcast(uniq).withColumnRenamed("id", "rep_id"), Seq("rep_id"))
      .select(col("qid"), col("dup_id").as("id"), col("dist"))
    FlatSearch.mergeTopK(uniq.unionByName(dups), k)
  }

  /** Delete by id set (`IndexIVFFlatDedup::remove_ids`,
    * `IndexIVFFlat.cpp:383-410`): removed duplicate instances just
    * leave the map; a removed representative with surviving instances
    * promotes its smallest one (the stored vector row is re-labeled —
    * the reference likewise rewrites the stored id in place); a
    * representative with no survivors drops the vector row. */
  def removeIds(index: DedupIndex, ids: DataFrame): DedupIndex = {
    val rem = ids.select(col("id").cast("long")).distinct()
    val inst1 = index.instances.join(
      rem.withColumnRenamed("id", "dup_id"), Seq("dup_id"), "left_anti")
    // promotions: removed reps that still have surviving instances
    val promo = inst1.join(
        rem.withColumnRenamed("id", "rep_id"), Seq("rep_id"), "left_semi")
      .groupBy(col("rep_id")).agg(min(col("dup_id")).as("new_id"))
    val kept = index.unique.join(rem, Seq("id"), "left_anti")
    val promoted = index.unique.as("u")
      .join(promo, col("u.id") === col("rep_id"))
      .select(col("list_no"), col("new_id").as("id"), col("vec"))
    val instKept = inst1.join(promo, Seq("rep_id"), "left_anti")
    val instPromoted = inst1.join(promo, Seq("rep_id"))
      .filter(col("dup_id") =!= col("new_id"))
      .select(col("new_id").as("rep_id"), col("dup_id"))
    DedupIndex(kept.unionByName(promoted),
      instKept.unionByName(instPromoted))
  }

  /** Persist: unique table partitioned by list (probes stay
    * partition-pruned), instances as a plain side table. */
  def write(index: DedupIndex, path: String): Unit = {
    IVFIndex.write(index.unique, s"$path/unique")
    index.instances.write.mode("overwrite").parquet(s"$path/instances")
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DedupIndex =
    DedupIndex(spark.read.parquet(s"$path/unique"),
      spark.read.parquet(s"$path/instances"))
}
