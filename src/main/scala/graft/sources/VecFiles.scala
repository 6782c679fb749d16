package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers/writers for the reference's vector file formats
  * (`Auncel/eval/bound.cpp:29-113`, `dist/gt.cpp:60-90`,
  * `dist/split.cpp:66-80`):
  *
  *  - `.fvecs`: per row `int32 d` + d × float32 (little-endian)
  *  - `.ivecs`: same layout, int32 payload
  *  - `.fbin`:  `int32 n, int32 d` header + n·d float32
  *
  * Ingest path: file → DataFrame (id = row number) → Parquet; at scale
  * the one-time conversion job is the supported route (parquet is the
  * native scan format — column-pruned, predicate-pushed).
  */
object VecFiles {

  def readFvecs(path: String): Array[Array[Float]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    while (buf.remaining() >= 4) {
      val d = buf.getInt()
      require(d > 0 && d < (1 << 24), s"bad fvecs dim $d")
      val v = new Array[Float](d)
      var i = 0
      while (i < d) { v(i) = buf.getFloat(); i += 1 }
      out += v
    }
    out.toArray
  }

  def readIvecs(path: String): Array[Array[Int]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    while (buf.remaining() >= 4) {
      val d = buf.getInt()
      require(d > 0 && d < (1 << 24), s"bad ivecs dim $d")
      val v = new Array[Int](d)
      var i = 0
      while (i < d) { v(i) = buf.getInt(); i += 1 }
      out += v
    }
    out.toArray
  }

  def readFbin(path: String): Array[Array[Float]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(); val d = buf.getInt()
    Array.fill(n) {
      val v = new Array[Float](d)
      var i = 0
      while (i < d) { v(i) = buf.getFloat(); i += 1 }
      v
    }
  }

  def writeFvecs(path: String, vecs: Array[Array[Float]]): Unit = {
    val buf = ByteBuffer.allocate(vecs.map(v => 4 + 4 * v.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => buf.putInt(v.length); v.foreach(buf.putFloat) }
    Files.write(Paths.get(path), buf.array())
  }

  /** ivecs writer (`dist/gt.cpp:60-90` emits GT id lists in this
    * format). */
  def writeIvecs(path: String, vecs: Array[Array[Int]]): Unit = {
    val buf = ByteBuffer.allocate(vecs.map(v => 4 + 4 * v.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    vecs.foreach { v => buf.putInt(v.length); v.foreach(buf.putInt) }
    Files.write(Paths.get(path), buf.array())
  }

  /** fbin writer (`int32 n, int32 d` header + flat float payload,
    * `dist/split.cpp:66-80`). All rows must share one dimension. */
  def writeFbin(path: String, vecs: Array[Array[Float]]): Unit = {
    val n = vecs.length
    val d = if (n == 0) 0 else vecs(0).length
    require(vecs.forall(_.length == d), "fbin rows must share one dim")
    val buf = ByteBuffer.allocate(8 + 4 * n * d).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(n); buf.putInt(d)
    vecs.foreach(_.foreach(buf.putFloat))
    Files.write(Paths.get(path), buf.array())
  }

  /** ibin writer — fbin layout with int32 payload. */
  def writeIbin(path: String, vecs: Array[Array[Int]]): Unit = {
    val n = vecs.length
    val d = if (n == 0) 0 else vecs(0).length
    require(vecs.forall(_.length == d), "ibin rows must share one dim")
    val buf = ByteBuffer.allocate(8 + 4 * n * d).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(n); buf.putInt(d)
    vecs.foreach(_.foreach(buf.putInt))
    Files.write(Paths.get(path), buf.array())
  }

  def readIbin(path: String): Array[Array[Int]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(); val d = buf.getInt()
    Array.fill(n) {
      val v = new Array[Int](d)
      var i = 0
      while (i < d) { v(i) = buf.getInt(); i += 1 }
      v
    }
  }

  /** fvecs → DataFrame (id LONG, vec ARRAY<FLOAT>). For files beyond
    * driver memory, split upstream (`dist/split.cpp`) and union. */
  def fvecsToDF(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readFvecs(path).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vec")
  }

  /** One-time conversion job: fvecs → Parquet collection. */
  def convertToParquet(spark: SparkSession, src: String, dest: String): Unit =
    fvecsToDF(spark, src).write.mode("overwrite").parquet(dest)

  /** Distributed fvecs read — the 100 TB path. fvecs rows are
    * fixed-length once d is known (`4 + 4d` bytes), so
    * `binaryRecords` splits the file across executors; ids are the
    * global record positions. Dimension is read from the first record. */
  def fvecsToDFDistributed(spark: SparkSession, path: String,
                           dim: Int = -1): DataFrame = {
    import spark.implicits._
    val d =
      if (dim > 0) dim
      else {
        val in = new DataInputStream(java.nio.file.Files.newInputStream(Paths.get(path)))
        try java.lang.Integer.reverseBytes(in.readInt())
        finally in.close()
      }
    val recLen = 4 + 4 * d
    spark.sparkContext.binaryRecords(path, recLen)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val dd = buf.getInt()
        require(dd == d, s"fvecs record $idx has dim $dd, expected $d")
        val v = new Array[Float](d)
        var i = 0
        while (i < d) { v(i) = buf.getFloat(); i += 1 }
        (idx, v)
      }
      .toDF("id", "vec")
  }
}
