package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** BLOOM-FILTER FILE SKIPPING for one declared high-cardinality column
  * (the role of Databricks' Delta bloom-filter index, public docs):
  * min/max bounds cannot prune a point lookup on a column whose values
  * interleave across files — every file's range contains every key —
  * but a per-file bloom filter answers "definitely not in this file"
  * for exact-match predicates, and that is precisely the needle-in-
  * 100-TB lookup shape (find one document id, one user, one order).
  *
  * Placement: the blooms live IN THE MANIFEST (base64, one blob per
  * file), so planning keeps the store's zero-metadata-call contract —
  * no sidecar read, no footer access. That choice caps sensible bloom
  * size: the default 2^18 bits = 32 KiB per file (~44 KB base64)
  * holds 1% false positives up to ~27 k distinct keys per file and
  * degrades ONE-SIDEDLY beyond (worse fpp = less skipping, never a
  * wrong result). Declaring the index is opt-in per table
  * ([[Versioned.declareBloomColumn]]) exactly because the manifest
  * grows by bloomBytes per data file.
  *
  * Build cost: one scan of ONLY the declared column of each NEW
  * commit's files (column-pruned parquet read), aggregated per file as
  * OR-able bitsets — the shuffle moves bitsets (one per open file per
  * input split), never values. O(delta) like the footer harvest it
  * rides beside.
  *
  * Hashing: FNV-1a 64 over the value's canonical bytes (integrals as
  * 8-byte big-endian, strings as UTF-8), k=7 probes by double hashing
  * — deterministic across JVMs, no dependence on Spark's internal
  * hash implementations.
  */
object Bloom {

  /** Types a bloom column may have: exact-match semantics are
    * byte-stable for integrals and strings; floats/decimals are not
    * point-lookup shapes. */
  def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  val defaultBits: Int = 1 << 18 // 32 KiB per file
  private val K = 7 // probes; fpp ≈ 1% at m/n ≈ 10

  private def fnv64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Canonical bytes of a value — integrals widen to long so an INT
    * column's build and an int-or-long literal's probe agree. */
  private[ext] def valueBytes(v: Any): Option[Array[Byte]] = v match {
    case null       => None
    case l: Long    => Some(java.nio.ByteBuffer.allocate(8).putLong(l).array())
    case i: Int     => valueBytes(i.toLong)
    case s: Short   => valueBytes(s.toLong)
    case b: Byte    => valueBytes(b.toLong)
    case s: String  => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
    case _          => None // unsupported literal type: cannot decide, never skip
  }

  private def setBits(bits: Array[Byte], bytes: Array[Byte]): Unit = {
    val m = bits.length.toLong * 8
    val h1 = fnv64(bytes, 0L)
    val h2 = fnv64(bytes, 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < K) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      bits((pos / 8).toInt) = (bits((pos / 8).toInt) | (1 << (pos % 8).toInt)).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], v: Any): Boolean = valueBytes(v) match {
    case None => true // undecidable value: the filter cannot skip
    case Some(bytes) =>
      val m = bits.length.toLong * 8
      val h1 = fnv64(bytes, 0L)
      val h2 = fnv64(bytes, 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < K) {
        val pos = ((h1 + i * h2) & Long.MaxValue) % m
        if ((bits((pos / 8).toInt) & (1 << (pos % 8).toInt)) == 0) return false
        i += 1
      }
      true
  }

  /** True iff the bloom PROVES no row of the file can satisfy `f` —
    * exact-match shapes only (EqualTo / In / EqualNullSafe on the
    * declared column, composed through And/Or), one-sided like every
    * skipping decision in this store. */
  def excludes(f: org.apache.spark.sql.sources.Filter, col: String,
               bits: Array[Byte]): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) if a == col && v != null => !mightContain(bits, v)
      case EqualNullSafe(a, v) if a == col && v != null => !mightContain(bits, v)
      // nulls never satisfy an IN — an all-null (or empty) list proves
      // emptiness; otherwise every non-null member must be absent
      case In(a, vs) if a == col =>
        vs.filter(_ != null).forall(v => !mightContain(bits, v))
      case And(l, r) => excludes(l, col, bits) || excludes(r, col, bits)
      case Or(l, r)  => excludes(l, col, bits) && excludes(r, col, bits)
      case _ => false
    }
  }

  /** Build one bloom per FILE of `dirPath` by scanning only `col` —
    * distributed: each input split folds its rows into a local
    * (file → bitset) map, and the driver ORs the per-split maps (the
    * collected payload is bitset-sized per open file per split, never
    * value-sized). */
  def buildDirBlooms(spark: SparkSession, dirPath: String, readSchema: StructType,
                     col: String, bits: Int): Map[String, Array[Byte]] =
    buildBlooms(spark, Seq("" -> dirPath), readSchema, col, bits)
      .getOrElse("", Map.empty)

  /** The multi-dir form — ONE Spark job over every dir (the backfill
    * of a declaration over N live dirs must not launch N sequential
    * jobs); results regroup to dirs by path prefix. `dirs` is
    * (manifest dir name, absolute dir path). */
  def buildBlooms(spark: SparkSession, dirs: Seq[(String, String)],
                  readSchema: StructType, col: String, bits: Int)
      : Map[String, Map[String, Array[Byte]]] = {
    require(bits >= 64 && bits % 8 == 0, s"bloom bits must be a positive multiple of 8, got $bits")
    if (dirs.isEmpty) return Map.empty
    import org.apache.spark.sql.functions.input_file_name
    val rows: DataFrame = spark.read.schema(readSchema)
      .parquet(dirs.map(_._2): _*)
      .select(input_file_name().as("__file"), org.apache.spark.sql.functions.col(col))
    val nBytes = bits / 8
    val partial = rows.rdd.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap.empty[String, Array[Byte]]
      it.foreach { r =>
        if (!r.isNullAt(1)) valueBytes(r.get(1)).foreach { vb =>
          val f = r.getString(0)
          setBits(acc.getOrElseUpdate(f, new Array[Byte](nBytes)), vb)
        }
      }
      acc.iterator
    }
    val collected = partial.reduceByKey { (a, b) =>
      val out = new Array[Byte](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
      out
    }.collect()
    // regroup by dir: compare URI paths (input_file_name is a URI,
    // the dir paths may be plain), longest prefix wins
    val prefixes = dirs.map { case (n, p) =>
      n -> (new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/") + "/")
    }.sortBy(-_._2.length)
    collected.toSeq.flatMap { case (filePath, bs) =>
      val uriPath = new org.apache.hadoop.fs.Path(filePath).toUri.getPath
      // the file KEY is the path RELATIVE to its dir — the manifest's
      // FileStats.name spelling: a bare basename for flat dirs, the
      // hive subpath (`col=value/part-….parquet`) for partitioned ones
      // (a basename key would silently never match and forfeit the
      // pruning on partitioned chains)
      prefixes.find { case (_, pre) => uriPath.startsWith(pre) }.map { case (n, pre) =>
        (n, uriPath.substring(pre.length), bs)
      }
    }.filter { case (_, rel, _) =>
      // a name the comma-delimited manifest tail cannot carry (Spark's
      // hive path escaping leaves ',' unescaped in partition values)
      // simply gets NO bloom — one-sided: the file is always read
      !rel.exists(c => c == ',' || c == '\n' || c == '\r')
    }.groupBy(_._1).map { case (n, xs) =>
      n -> xs.map(x => (x._2, x._3)).toMap
    }
  }

  def toBase64(bits: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bits)
  def fromBase64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)
}
