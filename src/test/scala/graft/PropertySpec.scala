package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based differential tests (SURVEY.md §5.2.3): the Spark
  * expressions are compared against plain-Scala reference
  * implementations of the same semantics on arbitrary inputs, and
  * structural invariants (explode cardinality, dense-id permutation,
  * as-of selection) are checked on generated data.
  *
  * Cases are kept small (each one runs Spark jobs); 10 successful
  * cases per property keeps the suite under a minute.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // plain-Scala reference of silver.Clean.cleanStringValue: strip the
  // u'…' repr wrapper, substring-normalize booleans, "none"→null
  // (ref: bronze_to_silver_on_minio.py:27-33)
  private def cleanRef(s: String): Option[String] = {
    val stripped = s.replaceAll("^u?'|'?$", "")
      .replace("True", "true").replace("False", "false")
    if (stripped.toLowerCase == "none") None else Some(stripped)
  }

  private val asciiGen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(
      (5, Gen.alphaNumChar), (2, Gen.const('\'')), (1, Gen.const('u')),
      (1, Gen.oneOf("TrueFalseNone".toSeq)), (1, Gen.const(' ')))))

  property("cleanStringValue == plain-Scala reference") =
    forAll(Gen.listOfN(5, asciiGen)) { strings =>
      val got = strings.toDF("v")
        .select(graft.silver.Clean.cleanStringValue($"v"))
        .as[Option[String]].collect().toSeq
      got == strings.map(cleanRef)
    }

  property("explode emits exactly sum-of-array-sizes rows") =
    forAll(Gen.listOfN(6, Gen.listOf(Gen.alphaStr).map(_.take(5)))) { arrays =>
      val n = arrays.toDF("arr").select(explode($"arr")).count()
      n == arrays.map(_.size).sum
    }

  property("denseId is a 1..N permutation aligned with sort order") =
    forAll(Gen.listOf(Gen.chooseNum(-1000, 1000)).map(_.distinct)) { keys =>
      keys.isEmpty || {
        val ids = graft.gold.Surrogate.denseId(keys.toDF("k"), "k", "id")
          .select("k", "id").as[(Int, Long)].collect().sortBy(_._1).map(_._2)
        ids.toSeq == (1L to keys.length.toLong)
      }
    }

  private val tsGen = Gen.chooseNum(0L, 3600L).map(s =>
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + s)))

  property("backward as-of join == per-row max(right <= left)") = {
    val eventsGen = Gen.listOfN(6, Gen.zip(Gen.chooseNum(1L, 3L), tsGen))
    val ordersGen = Gen.listOfN(4, Gen.zip(Gen.chooseNum(1L, 3L), tsGen))
    forAll(eventsGen, ordersGen) { (evs, ords) =>
      val events = evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "event_ts")
      val orders = ords.toDF("o_custkey", "o_orderdate")
      val got = graft.operators.AsOfJoin.joinAsOfBackward(events, orders,
        "user_id", "o_custkey", "event_ts", "o_orderdate", Seq("o_orderdate"))
        .select("event_id", "o_orderdate")
        .as[(Long, java.sql.Timestamp)].collect().toMap
      val expect = evs.zipWithIndex.flatMap { case ((u, t), i) =>
        val cand = ords.filter { case (ou, ot) => ou == u && !ot.after(t) }
        if (cand.isEmpty) None else Some(i.toLong -> cand.map(_._2).maxBy(_.getTime))
      }.toMap
      Prop(got == expect) :| s"got=$got expect=$expect"
    }
  }

  property("hashSplit partitions exactly once; fractions bound the hash") =
    forAll(Gen.listOf(Gen.chooseNum(-100000L, 100000L)).map(_.distinct)) { ids =>
      ids.isEmpty || {
        val df = ids.toDF("id")
        val split = graft.ext.Sampling.hashSplit(df, "id",
          Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
        // total cover, no duplication, only declared labels
        val rows = split.select($"id", $"split").as[(Long, String)].collect()
        rows.length == ids.length &&
          rows.map(_._1).toSet == ids.toSet &&
          rows.map(_._2).toSet.subsetOf(Set("a", "b", "c")) && {
            // fraction=1.0 keeps EVERY row (the 2^32 divisor guarantee)
            graft.ext.Sampling.deterministicSample(df, "id", 1.0).count() == ids.length
          }
      }
    }

  property("greedy packing: multi-doc bins never exceed the window") =
    forAll(Gen.listOfN(8, Gen.chooseNum(0, 12))) { tokenCounts =>
      val docs = tokenCounts.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val bins = graft.ext.Packing.assignBinsGreedy(docs, "doc_id", "text",
        windowTokens = 5, nShards = 2)
        .groupBy($"shard", $"bin")
        .agg(sum($"n_tokens").as("tot"), count(lit(1)).as("n"))
        .as[(Long, Long, Long, Long)].collect()
      bins.forall { case (_, _, tot, n) => n == 1 || tot <= 5 }
    }

  property("mv refresh over random batch splits == one-shot aggregation") =
    forAll(Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0, 50))),
      Gen.chooseNum(0, 10)) { (rows, cut) =>
      // integer-valued doubles: sums are exact, equality is legitimate
      val all = rows.map { case (k, x) => (k, x.toDouble) }
      val (a, b) = all.splitAt(cut min all.length)
      val keys = Seq("k")
      val direct = graft.ext.Materialized.aggregate(
        all.toDF("k", "x"), keys, "n", Seq("x"))
        .orderBy("k").as[(Long, Long, Double)].collect().toSeq
      val incremental = {
        val base = graft.ext.Materialized.aggregate(
          (if (a.isEmpty) all.take(0) else a).toDF("k", "x"), keys, "n", Seq("x"))
        (if (b.isEmpty) base
         else graft.ext.Materialized.refreshAdditive(base, b.toDF("k", "x"), keys, "n", Seq("x")))
          .orderBy("k").as[(Long, Long, Double)].collect().toSeq
      }
      Prop(incremental == direct) :| s"inc=$incremental direct=$direct"
    }

  property("rrf fusion: scores decrease with rank; both-list membership dominates") =
    forAll(Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) { (nA, nB) =>
      val a = (1 to nA).map(r => (r.toLong * 10, r)).toDF("id", "rank")
      val b = (1 to nB).map(r => (r.toLong * 10, r)).toDF("id", "rank")
      val got = graft.ext.Similarity.rrfFuse(a, b, "id", kRank = 60, topK = 100)
        .as[(Long, Double, Int)].collect()
      // output ordered by score desc (id tiebreak): scores non-increasing
      got.sliding(2).forall { case Array((_, s1, _), (_, s2, _)) => s1 >= s2
        case _ => true } &&
        // ids in both lists share the rank, so their fused score must
        // strictly exceed any single-list id at the same rank
        got.forall { case (id, s, n) =>
          val r = (id / 10).toInt
          val expect = (if (r <= nA) 1.0 / (60 + r) else 0.0) +
            (if (r <= nB) 1.0 / (60 + r) else 0.0)
          s == expect && n == (if (r <= nA) 1 else 0) + (if (r <= nB) 1 else 0)
        }
    }

  property("quantile band: trimmed set is contiguous in score order and within bounds") =
    forAll(Gen.listOfN(9, Gen.chooseNum(0L, 100L))) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "s")
      val kept = graft.ext.Sampling.quantileBandFilter(df, "s", 0.25, 0.75)
        .select("s").as[Long].collect().sorted.toSeq
      val sorted = xs.sorted
      // kept values form a contiguous value-range slice of the sorted
      // multiset: everything strictly between min-kept and max-kept is kept
      kept.nonEmpty && sorted.filter(v => v >= kept.head && v <= kept.last) == kept
    }

  property("identical texts are always MinHash-LSH candidates") =
    forAll(Gen.chooseNum(2, 4), Gen.alphaStr.suchThat(_.nonEmpty)) { (copies, text) =>
      val docs = (0 until copies).map(i => (i.toLong, s"$text $text $text"))
        .toDF("doc_id", "text")
      val sig = graft.ext.Dedup.minhashSignatures(docs, "text", "doc_id", 8)
      val pairs = graft.ext.Dedup.minhashCandidates(sig, "doc_id")
        .as[(Long, Long)].collect().toSet
      val allPairs = (for {
        a <- 0 until copies; b <- a + 1 until copies
      } yield (a.toLong, b.toLong)).toSet
      pairs == allPairs
    }

  // ─── manifest data skipping: differential under arbitrary chains ───
  // The skipping evaluator is one-sided-by-construction, but its
  // canonical-domain comparisons (UTF-8 string order, integral/double
  // parsing, null bookkeeping) are exactly where a subtle bug silently
  // DROPS rows. Differential: a skipping read must equal the plain
  // filtered read on arbitrary version chains, null patterns, and
  // filter shapes (including supplementary-plane strings — the round-8
  // UTF-16-order bug class).
  import org.apache.spark.sql.sources._

  private val skipTagGen: Gen[Option[String]] = Gen.frequency(
    (3, Gen.oneOf("a", "bb", "z ", "\u20ac", "\ud83d\ude00", "\uffff").map(Some(_))),
    (1, Gen.const(None)))
  private val skipRowGen: Gen[(Option[Long], Option[String], Option[Double])] =
    for {
      id <- Gen.frequency((4, Gen.chooseNum(-60L, 60L).map(Some(_))), (1, Gen.const(None)))
      tag <- skipTagGen
      x <- Gen.frequency((4, Gen.chooseNum(-5.0, 5.0).map(Some(_))), (1, Gen.const(None)))
    } yield (id, tag, x)

  private val skipValueGen: String => Gen[Any] = {
    case "id"  => Gen.chooseNum(-70L, 70L).map(v => v: Any)
    case "tag" => Gen.oneOf("a", "bb", "z ", "\u20ac", "\ud83d\ude00", "\uffff", "q").map(v => v: Any)
    case _     => Gen.chooseNum(-6.0, 6.0).map(v => v: Any)
  }

  private val skipLeafGen: Gen[Filter] = for {
    c <- Gen.oneOf("id", "tag", "x")
    v <- skipValueGen(c)
    f <- Gen.oneOf[Filter](EqualTo(c, v), GreaterThan(c, v), GreaterThanOrEqual(c, v),
      LessThan(c, v), LessThanOrEqual(c, v), IsNull(c), IsNotNull(c),
      In(c, Array(v)))
  } yield f

  private val skipFilterGen: Gen[Filter] = Gen.frequency(
    (4, skipLeafGen),
    (1, for { a <- skipLeafGen; b <- skipLeafGen } yield Or(a, b)),
    (1, for { a <- skipLeafGen; b <- skipLeafGen } yield And(a, b)))

  private def filterColumn(f: Filter): org.apache.spark.sql.Column = f match {
    case EqualTo(a, v)            => col(a) === lit(v)
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a)                => col(a).isNull
    case IsNotNull(a)             => col(a).isNotNull
    case And(l, r)                => filterColumn(l) && filterColumn(r)
    case Or(l, r)                 => filterColumn(l) || filterColumn(r)
    case other => sys.error(s"unexpected $other")
  }

  property("readVersionSkipping == readVersion.filter on arbitrary chains and filters") =
    forAll(
      Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 6).flatMap(m => Gen.listOfN(m, skipRowGen)))),
      Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, skipFilterGen))) { (batches, filters) =>
      import graft.ext.Versioned
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_skip").toString + "/t"
      batches.zipWithIndex.foreach { case (rows, i) =>
        Versioned.writeVersion(rows.toDF("id", "tag", "x"), dir,
          if (i == 0) org.apache.spark.sql.SaveMode.Overwrite
          else org.apache.spark.sql.SaveMode.Append)
      }
      val v = Versioned.latestVersion(spark, dir).get
      val viaSkip = Versioned.readVersionSkipping(spark, dir, v, filters)
        .collect().map(_.toString).sorted.toSeq
      val pred = filters.map(filterColumn).reduce(_ && _)
      val viaFilter = Versioned.readVersion(spark, dir, v).filter(pred)
        .collect().map(_.toString).sorted.toSeq
      val ok = viaSkip == viaFilter
      if (!ok) println(s"MISMATCH dir=$dir filters=$filters\nskip=$viaSkip\nfull=$viaFilter")
      ok
    }
}
