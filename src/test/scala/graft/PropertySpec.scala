package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Coercions, PersianText, RelativeDates}
import graft.operators.{KeyedSink, SearchIndex}

/** Property-style totality and round-trip checks (SURVEY §5.4):
  * generated inputs are batched into one DataFrame per property so each
  * property is a single Spark job, not one per sample.
  */
class PropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val garbageString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("۰۱۲۳۴۵۶۷۸۹ روز پیش ماه هفته توافقی میلیارد .+-".toSeq))
      .map(_.mkString),
    Gen.const(""), Gen.const("   "),
    Gen.numStr, Gen.const("12.7"), Gen.const("+-12"), Gen.const("1e308"))

  test("coercions are total: never throw, typed results on arbitrary strings") {
    val in = samples(garbageString).toDF("s")
    val out = in.select(
      Coercions.safeInt(col("s")).as("si"),
      PersianText.toDoubleOrNull(col("s")).as("d"),
      PersianText.toLongOrNull(col("s")).as("l"),
      PersianText.parseTomanAmount(col("s")).as("toman"),
      PersianText.normalizePropertyType(col("s")).as("pt"),
      PersianText.toSlug(col("s")).as("slug")).collect()
    assert(out.length === samples(garbageString).length)
    assert(out.forall(!_.isNullAt(0))) // safeInt always defaults
  }

  test("relative dates are total and never in the future of ref") {
    val refStr = "2025-10-21 12:00:00"
    val in = samples(garbageString).toDF("s")
    val out = in.select(
      RelativeDates.textToDateDivar(col("s"), to_timestamp(lit(refStr))).as("d"),
      RelativeDates.textToDateSheypoor(col("s"), to_timestamp(lit(refStr))).as("sh"))
      .collect()
    val ref = java.sql.Timestamp.valueOf(refStr)
    out.foreach { r =>
      assert(!r.isNullAt(0))
      assert(!r.getTimestamp(0).after(ref)) // relative dates only look back
      assert(!r.getTimestamp(1).after(ref))
    }
  }

  test("pivot ∘ melt is the identity on non-null wide rows") {
    val gen = for {
      id <- Gen.choose(1L, 1000000L)
      meter <- Gen.choose(1, 999)
      rooms <- Gen.choose(0, 9)
    } yield (id, meter.toString, rooms.toString)
    val wide = samples(gen, 200).distinctBy(_._1).toDF("DepositId", "meter", "rooms")
    val melted = SearchIndex.eavMelt(wide, "DepositId",
      Seq("meter" -> 1224, "rooms" -> 1143))
    val repivoted = SearchIndex.pivotCustomFields(
      melted, Seq((0, "")).toDF("Id", "Value"))
      .select(col("DepositId"), col("meter"), col("rooms"))
    val want = wide.orderBy("DepositId").collect().map(_.toSeq).toSeq
    val got = repivoted.orderBy("DepositId").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("keyed sink is idempotent under random duplicate-heavy batches") {
    val gen = for {
      k <- Gen.oneOf((1 to 40).map(i => s"k$i") :+ null)
      v <- Gen.choose(0, 1000)
    } yield (k, v)
    val batch = samples(gen, 400).toDF("k", "v")
    val existing = batch.limit(50).filter(col("k").isNotNull).dropDuplicates("k")
    val once = KeyedSink.upsertAbsent(existing, batch, "k")
    val twice = KeyedSink.upsertAbsent(once, batch, "k")
    assert(once.count() === twice.count())
    // every key appears exactly once and no null keys survive
    val keyCounts = twice.groupBy("k").count().collect()
    assert(keyCounts.forall(r => r.getLong(1) == 1L && !r.isNullAt(0)))
  }

  test("cleanup and star-load helpers are total on arbitrary strings") {
    import graft.operators.{CollectionCleanup, DivarToDelta}
    val in = samples(garbageString).toDF("s")
    val out = in.select(
      CollectionCleanup.normalizeMoreThan(col("s")).as("mt"),
      CollectionCleanup.roomsCount(col("s")).as("rc"),
      CollectionCleanup.constructionYear(col("s")).as("cy"),
      CollectionCleanup.tryParseLong(col("s")).as("pl"),
      DivarToDelta.daysAgo(col("s")).as("da"),
      DivarToDelta.mainStreet(col("s")).as("ms"),
      DivarToDelta.fixFloor(col("s")).as("ff"),
      DivarToDelta.floorOption(col("s")).as("fo")).collect()
    assert(out.length === samples(garbageString).length)
    // daysAgo defaults to 0 rather than failing (total, never null)
    out.foreach(r => assert(!r.isNullAt(r.fieldIndex("da"))))
    // a recognized unit with an unparseable count hits the 0-day
    // default (the coalesce), not null
    val malformed = Seq("xyz روز پیش", "روز", "").toDF("s")
      .select(DivarToDelta.daysAgo(col("s")).as("da")).collect()
    assert(malformed.forall(r => !r.isNullAt(0) && r.getLong(0) == 0L))
  }

  test("image header parser is total on arbitrary byte soup") {
    import graft.sources.MultiModal.ImageHeaders
    val magic: Gen[Array[Byte]] = Gen.oneOf(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "GIF89a".getBytes, "GIF87a".getBytes, Array.emptyByteArray)
    val soup: Gen[Array[Byte]] = for {
      m <- magic
      body <- Gen.listOfN(40, Gen.chooseNum(-128, 127).map(_.toByte))
      cut <- Gen.chooseNum(0, 40)
    } yield m ++ body.take(cut)
    // truncated signatures, random segment walks, empty arrays: the
    // parser must return None or a parse, never throw or loop
    samples(soup, 400).foreach { bytes =>
      val r = ImageHeaders.parse(bytes)
      r.foreach { case (fmt, w, h) =>
        assert(Set("png", "jpeg", "gif")(fmt) && w >= 0 && h >= 0)
      }
    }
  }

  test("two-tier Bloom dedup equals exact dedup for random data") {
    val gen = Gen.oneOf((1 to 60).map(i => s"u$i"))
    val existing = samples(gen, 80).distinct.toDF("k")
    val incoming = samples(gen, 200).toDF("k")
    val bloom = KeyedSink.buildBloom(existing, "k", 1000, 0.01)
    val exact = KeyedSink.newRowsOnly(existing, incoming, "k")
      .as[String].collect().sorted.toSeq
    val tiered = KeyedSink.dedupTwoTier(existing, incoming, "k", bloom)
      .as[String].collect().sorted.toSeq
    assert(tiered === exact)
  }

  test("exact-substring spans equal brute force, partitioning-independent") {
    import graft.queries.TextDedup
    val k = 3
    // small vocabulary -> dense cross-document duplicate grams
    val docGen = for {
      len <- Gen.choose(0, 25)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield ws.mkString(" ")
    val docs = samples(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // brute force: every k-gram position; duplicated = the gram occurs
    // in >= 2 distinct docs; islands merge positions within k
    val gramsOf = docs.map { case (id, t) =>
      val w = t.split(" ", -1).toSeq
      id -> (if (w.length < k) Seq.empty[(Int, String)]
             else (0 to w.length - k)
               .map(i => i -> w.slice(i, i + k).mkString(" ")))
    }.toMap
    val docsPerGram = gramsOf.toSeq
      .flatMap { case (id, gs) => gs.map { case (_, g) => g -> id } }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = docs.flatMap { case (id, _) =>
      val dupPos = gramsOf(id).collect {
        case (p, g) if docsPerGram(g) >= 2 => p
      }.sorted
      if (dupPos.isEmpty) Seq.empty
      else dupPos.tail.foldLeft(Vector((dupPos.head, dupPos.head))) {
        case (acc, p) =>
          val (s0, last) = acc.last
          if (p - last <= k) acc.init :+ ((s0, p))
          else acc :+ ((p, p))
      }.map { case (s0, e0) => (id, s0.toLong, e0.toLong + k) }
    }.sorted
    Seq(1, 7, 32).foreach { parts =>
      val got = TextDedup.exactSubstrSpans(
        docs.toDF("doc_id", "text").repartition(parts), k)
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("exact-substring APPLY equals brute force (keep-one canonical)") {
    import graft.queries.TextDedup
    val k = 3
    val docGen = for {
      len <- Gen.choose(0, 20)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" ")
    val docs = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val gramsOf = docs.map { case (id, t) =>
      val w = t.split(" ", -1).toSeq
      id -> (w, if (w.length < k) Seq.empty[(Int, String)]
                else (0 to w.length - k)
                  .map(i => i -> w.slice(i, i + k).mkString(" ")))
    }.toMap
    val minDocOf = gramsOf.toSeq
      .flatMap { case (id, (_, gs)) => gs.map { case (_, g) => g -> id } }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = docs.map { case (id, _) =>
      val (w, gs) = gramsOf(id)
      val covered = gs.collect {
        case (p, g) if minDocOf(g) < id => p until (p + k)
      }.flatten.toSet
      val kept = w.zipWithIndex.collect {
        case (t, i) if !covered(i) => t }
      (id, w.length.toLong, covered.size.toLong, kept.mkString(" "))
    }.sorted
    Seq(1, 7).foreach { parts =>
      val got = TextDedup.exactSubstrDedupApply(
        docs.toDF("doc_id", "text").repartition(parts), k)
        .as[(Long, Long, Long, String)].collect().sorted.toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("edit-distance blocking is lossless on random short strings") {
    val gen = for {
      len <- Gen.choose(0, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocab = samples(gen, 200).distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for (a <- vocab; b <- vocab if a < b; d = lev(a, b) if d <= 2)
      yield (a, b, d)).toSet
    val got = graft.operators.FuzzyMatch
      .editDistancePairs(vocab.toDF("w"), "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === want)
    // the linear-decision twin (t94): kept ⇔ not any pair's b-side
    val wantKept = vocab.map(w => w -> !want.exists(_._2 == w)).toMap
    val gotKept = graft.operators.FuzzyMatch
      .editDistanceDedup(vocab.toDF("w"), "w", maxDist = 2)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(gotKept === wantKept)
  }

  test("scd2 intervals partition each key's timeline on random changelogs") {
    val gen = for {
      k <- Gen.choose(1L, 10L)
      t <- Gen.choose(0L, 1000L)
    } yield (k, t)
    val ch = samples(gen, 300).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val h = graft.operators.Cdc.scd2(
        ch.toDF("k", "t", "id"), Seq("k"), Seq("t", "id"))
      .select("k", "t", "id", "effective_from", "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getInt(5)))
    h.groupBy(_._1).foreach { case (_, rows) =>
      // order by (from, to): zero-length intervals from equal-timestamp
      // versions sort before the interval that continues past them
      val sorted = rows.sortBy(r => (r._2, r._3.getOrElse(Long.MaxValue)))
      // exactly one open row per key, and it is the last
      assert(sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty)
      assert(sorted.count(_._4 == 1) == 1 && sorted.last._4 == 1)
      // each row's effective_to is the next row's effective_from
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (_, _, to, _) = pair(0)
          val (_, from, _, _) = pair(1)
          assert(to.contains(from))
        }
      }
    }
  }

  test("grid neighbor join equals brute force on random points") {
    val gen = for {
      x <- Gen.choose(0L, 300L)
      y <- Gen.choose(0L, 300L)
    } yield (x, y)
    val pts = samples(gen, 250).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val r = 25L
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib && math.abs(xa - xb) <= r && math.abs(ya - yb) <= r
    } yield (ia, ib)).toSet
    val got = graft.operators.GridJoin
      .neighborPairs(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .select("id_a", "id_b")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got === want)
    // the linear-decision twin (t96): kept ⇔ never a pair's higher id
    val wantKept = pts.map { case (i, _, _) => i -> !want.exists(_._2 == i) }.toMap
    val gotKept = graft.operators.GridJoin
      .neighborDedup(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .collect().map(row => row.getLong(0) -> row.getBoolean(1)).toMap
    assert(gotKept === wantKept)
  }

  test("interval coverage equals a brute-force sweep on random intervals") {
    val gen = for {
      k <- Gen.choose(1L, 5L)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 40L)
    } yield (k, s, s + len)
    val ivs = samples(gen, 400).zipWithIndex
      .map { case ((k, s, e), i) => (k, i.toLong, s, e) }
    val got = graft.operators.Intervals
      .coverage(ivs.toDF("k", "id", "s", "e"), Seq("k"), "s", "e", Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute force: per key, mark every covered unit point on a line
    val want = ivs.groupBy(_._1).map { case (k, rows) =>
      val pts = collection.mutable.BitSet()
      rows.foreach { case (_, _, s, e) => (s until e).foreach(p => pts += p.toInt) }
      k -> pts.size.toLong
    }
    assert(got === want)
  }

  test("changelog compaction is order- and slicing-independent on random changelogs") {
    val gen = for {
      k <- Gen.choose(1L, 20L)
      op <- Gen.frequency(4 -> Gen.const("U"), 1 -> Gen.const("D"))
      v <- Gen.choose(0L, 1000L)
    } yield (k, op, v)
    val ch = samples(gen, 500).zipWithIndex
      .map { case ((k, op, v), i) => (k, i.toLong, op, v) }
    val df = ch.toDF("k", "seq", "op", "v")
    val oneShot = graft.operators.Cdc
      .compactChangelog(df, Seq("k"), Seq("seq"), "op")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // sliced by seq mod 3 (each slice spans the whole key space, out of
    // order), merged incrementally with tombstones, replayed twice
    var state = df.filter(lit(false)).localCheckpoint()
    for (_ <- 0 until 2; m <- Seq(2, 0, 1))
      state = graft.operators.Cdc.compactChangelog(
        state.unionByName(df.filter($"seq" % 3 === m)),
        Seq("k"), Seq("seq"), "op", keepTombstones = true).localCheckpoint()
    val sliced = state.filter($"op" =!= "D")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(sliced === oneShot)
    // in-memory truth
    val want = ch.groupBy(_._1).flatMap { case (k, rows) =>
      val (_, seq, op, v) = rows.maxBy(_._2)
      if (op == "D") None else Some((k, seq, v))
    }.toSet
    assert(oneShot === want)
  }

  test("native as-of join equals the composed union+window form on random inputs (q137)") {
    val rnd = new scala.util.Random(7)
    // unique (key, time) per side so tie order cannot differ between
    // the two implementations (both leave equal-time right order
    // unspecified); keys deliberately overlap only partially so the
    // left-outer null path is exercised
    val lefts = rnd.shuffle((0 until 400).toList).take(300).map { i =>
      (i.toLong % 23 - 3, (i * 97).toLong % 5000, i.toLong)
    }
    val rights = rnd.shuffle((0 until 400).toList).take(250).map { i =>
      (i.toLong % 29 - 3, (i * 89).toLong % 5000 + 1, i.toLong * 10)
    }
    val l = lefts.toDF("k", "t", "lv")
    val r = rights.toDF("k", "rt", "rv")
    for {
      dir <- Seq("backward", "forward")
      tol <- Seq(None, Some(700L))
    } {
      val composed = graft.operators.TemporalJoin
        .asOfJoin(l, r, Seq("k"), "t", "rt", tol, dir)
        .collect().map(_.toString).sorted.toSeq
      val native = graft.operators.TemporalJoin
        .asOfJoinNative(l, r, Seq("k"), "t", "rt", tol, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(native === composed,
        s"native as-of diverged from composed (direction=$dir, tol=$tol)")
    }
  }

  test("TopK aggregator: any merge tree equals the sort-take reference (q133)") {
    import graft.functions.TopK
    val agg = new TopK.TopKByCount(5)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      // full per-value counts (the input contract): unique values
      val n = 1 + rnd.nextInt(30)
      val es = rnd.shuffle((0 until 60).toList).take(n)
        .map(v => TopK.Entry(v.toLong, 1L + rnd.nextInt(8).toLong))
      val reference = es.sortBy(e => (-e.cnt, e.value)).take(5)
      // random partition split + random merge tree
      val chunks = es.grouped(1 + rnd.nextInt(es.length)).toVector
      val bufs = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.reduceLeft((a, b) =>
        if (rnd.nextBoolean()) agg.merge(a, b) else agg.merge(b, a))
      assert(agg.finish(merged).entries === reference,
        s"trial $trial: merge tree diverged from reference")
    }
    // end-to-end: the registered UDAF is partitioning-independent
    val fn = TopK.register(spark, 3)
    val rows = (0 until 200).map(i => ((i % 7).toLong, (i % 23).toLong))
    def topkOf(parts: Int): Seq[String] = {
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
        .createOrReplaceTempView("prop_topk_counts")
      spark.sql(
        s"SELECT g, $fn(v, cnt) tk FROM prop_topk_counts GROUP BY g ORDER BY g")
        .collect().map(_.toString).toSeq
    }
    assert(topkOf(1) === topkOf(13))
  }
}
