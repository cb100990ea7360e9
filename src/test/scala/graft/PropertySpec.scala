package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{HopWindows, JsonPathEval, ToCharUdf}

/** Property tests for the hand-written kernels (the reference covers its
  * expression layer with per-function test files + `arbitrary` fuzz
  * hooks — SURVEY §5.3; this is the Spark-side analogue). Uses raw
  * ScalaCheck generators with a fixed seed (scalatestplus bridge is not
  * on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val microsGen: Gen[Long] =
    Gen.choose(0L, 4102444800000000L) // 1970..2100

  test("hop_windows: every ts falls in each returned window, count = size/slide") {
    val caseGen = for {
      ts <- microsGen
      slide <- Gen.choose(1L, 3600L).map(_ * 1000000L)
      mult <- Gen.choose(1, 6)
    } yield (ts, slide, mult)
    samples(caseGen).foreach { case (ts, slide, mult) =>
      val size = slide * mult
      val ws = HopWindows.windowsFor(ts, slide, size)
      assert(ws.length == mult, s"ts=$ts slide=$slide mult=$mult")
      ws.foreach { case (s, e) =>
        assert(s <= ts && ts < e && e - s == size && s % slide == 0)
      }
      assert(ws.map(_._1).distinct.length == ws.length)
    }
  }

  test("delta interval property parsing: every unit round-trips to " +
      "exact millis; junk refuses") {
    val unitGen = Gen.oneOf(
      ("second", 1000L), ("minute", 60000L), ("hour", 3600000L),
      ("day", 86400000L), ("week", 604800000L))
    val caseGen = for {
      (u, ms) <- unitGen
      n <- Gen.choose(0L, 10000L)
      plural <- Gen.oneOf("", "s")
      caps <- Gen.oneOf("interval", "INTERVAL", "Interval")
    } yield (s"$caps $n $u$plural", n * ms)
    samples(caseGen).foreach { case (s, want) =>
      assert(graft.sources.DeltaLite.parseInterval(s) == want, s)
    }
    Seq("interval 5 fortnights", "7 days", "interval days").foreach(bad =>
      intercept[IllegalArgumentException](
        graft.sources.DeltaLite.parseInterval(bad)))
  }

  test("to_char %-escape keeps literal text") {
    val caseGen = for {
      ts <- microsGen
      text <- Gen.alphaNumStr.map(_.take(20))
    } yield (ts, text)
    samples(caseGen).foreach { case (ts, text) =>
      assert(ToCharUdf.format(ts, text) == text)
    }
  }

  test("to_char date parts agree with java.time") {
    samples(microsGen).foreach { ts =>
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(ts, 1000000L), Math.floorMod(ts, 1000000L) * 1000L)
      val zdt = inst.atZone(java.time.ZoneOffset.UTC)
      assert(ToCharUdf.format(ts, "%Y") == f"${zdt.getYear}%04d")
      assert(ToCharUdf.format(ts, "%H:%M:%S") ==
        f"${zdt.getHour}%02d:${zdt.getMinute}%02d:${zdt.getSecond}%02d")
      assert(ToCharUdf.format(ts, "%F") ==
        f"${zdt.getYear}%04d-${zdt.getMonthValue}%02d-${zdt.getDayOfMonth}%02d")
    }
  }

  test("json_value extracts any planted scalar at a generated path") {
    val caseGen = for {
      k1 <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      k2 <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      v <- Gen.choose(-1000000, 1000000)
    } yield (k1, k2, v)
    samples(caseGen).foreach { case (k1, k2, v) =>
      val doc = s"""{"$k1": {"$k2": $v}}"""
      assert(JsonPathEval.value(doc, s"$$.$k1.$k2") == v.toString)
    }
  }

  test("duration parsing is unit-consistent") {
    samples(Gen.choose(1L, 10000L)).foreach { n =>
      assert(HopWindows.parseDurationMicros(s"$n seconds") == n * 1000000L)
      assert(HopWindows.parseDurationMicros(s"$n minutes") ==
        60L * HopWindows.parseDurationMicros(s"$n seconds"))
    }
  }

  test("intersectLongCount agrees with Set intersection on random arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arrGen = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.toArray)
    val caseGen = for { a <- arrGen; b <- arrGen } yield (a, b)
    samples(caseGen, n = 500).foreach { case (a, b) =>
      val got = org.apache.spark.sql.graft.VectorKernels.intersectLongCount(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val want = a.toSet.intersect(b.toSet).size
      assert(got == want, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("binned range join equals naive filtering on random points/intervals") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // one randomized dataset, several bin widths — the width must never
    // change results, only the plan
    val pts = samples(Gen.choose(-100.0, 100.0), n = 120).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }
    val ivs = samples(
      for { lo <- Gen.choose(-120.0, 110.0); len <- Gen.choose(-5.0, 30.0) }
        yield (lo, lo + len), n = 60).zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
    val pdf = pts.toDF("pid", "p")
    val idf = ivs.toDF("iid", "lo", "hi")
    val naive = pts.flatMap { case (pid, p) =>
      ivs.collect { case (iid, lo, hi) if p >= lo && p < hi => (pid, iid) }
    }.toSet
    Seq(0.7, 5.0, 50.0).foreach { w =>
      val got = graft.operators.RangeJoin
        .pointInInterval(pdf, "p", idf, "lo", "hi", binWidth = w)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("Debezium encode/decode round-trips random change histories") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.cdc.{ChangeModel, Debezium}
    // random per-key histories: insert, then a mix of updates/deletes;
    // pre/post pairs share a seq like a real feed
    val histGen = for {
      nKeys <- Gen.choose(1, 8)
      ops <- Gen.listOfN(nKeys * 3, Gen.oneOf("u", "d", "c"))
    } yield (nKeys, ops)
    samples(histGen, n = 25).zipWithIndex.foreach { case ((nKeys, ops), run) =>
      var seq = 0L
      val changes = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      (0 until nKeys).foreach { k =>
        seq += 1
        changes += ((k.toLong, s"v$run-$k-0", ChangeModel.Insert, seq))
      }
      ops.zipWithIndex.foreach { case (op, i) =>
        val k = (i % nKeys).toLong
        seq += 1
        op match {
          case "u" =>
            changes += ((k, s"v$run-$k-${i}a", ChangeModel.UpdatePre, seq))
            changes += ((k, s"v$run-$k-${i}b", ChangeModel.UpdatePost, seq))
          case "d" => changes += ((k, s"v$run-$k-$i", ChangeModel.Delete, seq))
          case "c" => changes += ((k, s"v$run-$k-$i", ChangeModel.Insert, seq))
        }
      }
      val df = changes.toSeq
        .toDF("id", "name", ChangeModel.OpCol, ChangeModel.SeqCol)
      val decoded = Debezium.decode(
        Debezium.encode(df, Seq("id")), "value",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType))))
      // the round-trip must preserve the APPLIED state exactly
      val want = ChangeModel.applyChanges(df, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = ChangeModel.applyChanges(decoded, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, s"run $run: $changes")
    }
  }

  test("connected components agree with brute-force reachability on random graphs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m,
        for { a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) }
          yield (a.toLong, b.toLong))
    } yield edges.filter(e => e._1 != e._2)
    samples(graphGen, n = 15).filter(_.nonEmpty).zipWithIndex.foreach {
      case (edges, run) =>
        // brute force: repeated relabeling to fixpoint
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val label = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
        var changed = true
        while (changed) {
          changed = false
          edges.foreach { case (a, b) =>
            val m = math.min(label(a), label(b))
            if (label(a) != m) { label(a) = m; changed = true }
            if (label(b) != m) { label(b) = m; changed = true }
          }
        }
        val df = edges.toDF("id_a", "id_b")
        Seq(4000000L, 0L).foreach { thr => // driver and distributed paths
          val got = graft.operators.Dedup
            .connectedComponents(df, "id_a", "id_b",
              maxIter = 40, maxDriverEdges = thr)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == label.toMap, s"run $run thr $thr edges $edges")
        }
    }
  }

  test("shinglesFast UDF equals the builtin shingle expression on random docs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wordGen = Gen.oneOf("a", "bb", "ccc", "的", "x1", "-", "word")
    val docGen = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val docs = samples(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    Seq(1, 2, 3, 5).foreach { w =>
      val both = df.select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text"), w).as("builtin"),
        graft.operators.Dedup.shinglesFast(col("text"), w).as("fast"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"w=$w doc=${r.getLong(0)}")
      }
    }
  }

  test("repetitionStats kernel equals the explode+aggregate formulation") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wordGen = Gen.oneOf("a", "b", "c", "dd", "e e") // "e e" -> two tokens
    val docGen = for {
      n <- Gen.choose(1, 20)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val docs = samples(docGen, 100).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val fast = graft.operators.TextOps
      .repetitionStats(df, "doc_id", "text", nTop = 2, nDup = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("top_gram"), r.getAs[Long]("top_n"),
          r.getAs[Long]("n_grams"), r.getAs[Double]("dup2_fraction"),
          r.getAs[Double]("dup3_fraction")))).toMap
    // reference: the original explode + min(struct) aggregation shape
    val counts = df.select(col("doc_id"),
        explode(graft.operators.Dedup.shingles(col("text"), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val agg = counts.groupBy(col("doc_id"))
      .agg(min(struct((-col("cnt")).as("nc"), col("gram").as("g"))).as("t"),
        sum(col("cnt")).as("n_grams"), count(lit(1)).as("n_distinct"))
    val dup3 = df.select(col("doc_id"),
      graft.operators.TextOps.dupNgramFraction(col("text"), 3).as("d3"))
    val ref = agg.join(dup3, Seq("doc_id")).collect().map { r =>
      val ng = r.getAs[Long]("n_grams")
      val nd = r.getAs[Long]("n_distinct")
      r.getAs[Long]("doc_id") -> ((
        r.getStruct(1).getString(1), -r.getStruct(1).getLong(0), ng,
        (ng - nd).toDouble / ng, r.getAs[Double]("d3")))
    }.toMap
    assert(fast == ref)
  }

  test("Dsir.bucketOf equals Spark pmod(hash(s), dim) on arbitrary unicode") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    // include supplementary-plane symbols — the kernel hashes UTF8
    // bytes like Spark, not UTF-16 code units
    val strGen = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("的", "é", "𝔘", "🙂", "a b", "")).map(_.mkString))
    val strs = samples(Gen.frequency((1, Gen.const("")), (9, strGen)), 150)
      .distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    Seq(2, 64, 1024).foreach { dim =>
      val rows = strs.toDF("id", "s")
        .select(col("id"), col("s"), pmod(hash(col("s")), lit(dim)).as("b"))
        .collect()
      rows.foreach { r =>
        assert(graft.operators.Dsir.bucketOf(r.getString(1), dim) == r.getInt(2),
          s"dim=$dim s=${r.getString(1)}")
      }
    }
  }

  test("SPS encode → parse round-trips arbitrary even resolutions and " +
      "profiles (cropping window inclusive)") {
    import graft.operators.IsoBmff
    val caseGen = for {
      profile <- Gen.oneOf(66, 77, 100)
      level <- Gen.oneOf(10, 30, 31, 40, 42, 51, 62)
      w <- Gen.choose(1, 2048).map(_ * 2)
      h <- Gen.choose(1, 1080).map(_ * 2)
    } yield (profile, level, w, h)
    samples(caseGen).foreach { case (p, l, w, h) =>
      val parsed = IsoBmff.parseSps(IsoBmff.AvcEncode.sps(p, l, w, h))
      assert(parsed.contains((p, 0, l, w, h)), s"p=$p l=$l ${w}x$h")
    }
  }

  test("Kafka RecordBatch v2 byte records round-trip arbitrary binary " +
      "payloads (incl. tombstones, empty and null keys)") {
    import graft.cdc.KafkaBatch
    val bytesGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.const(null: Array[Byte]),
      Gen.const(Array.emptyByteArray),
      Gen.choose(1, 200).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray)))
    val recGen = for {
      k <- bytesGen; v <- bytesGen
      tsDelta <- Gen.choose(0L, 100000L)
    } yield (1700000000000L + tsDelta, k, v)
    val batchGen = for {
      base <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(1, 12)
      recs <- Gen.listOfN(n, recGen)
      codec <- Gen.oneOf(0, 1, 2, 3, 4)
    } yield (base, recs, codec)
    samples(batchGen, n = 120).foreach { case (base, recs, codec) =>
      val frame = KafkaBatch.Encode.batchBytes(base, recs.map(_._1).min,
        recs, codec = codec)
      val back = KafkaBatch.decodeBatchBytes(frame)
      assert(back.length == recs.length)
      back.zip(recs).zipWithIndex.foreach { case ((got, (ts, k, v)), i) =>
        assert(got.offset == base + i && got.tsMillis == ts)
        def eq(a: Array[Byte], b: Array[Byte]) =
          (a == null && b == null) ||
            (a != null && b != null && java.util.Arrays.equals(a, b))
        assert(eq(got.key, k) && eq(got.value, v), s"codec=$codec rec $i")
      }
    }
  }

  test("JsMini template literals: any literal text round-trips through " +
      "the lexer escape cycle") {
    import graft.functions.JsMini
    import graft.functions.JsMini._
    val textGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('`', '$', '{', '}', '\\', '\n', ' ',
        '"', '\'')))
      .map(_.mkString).map(_.take(40))
    samples(textGen, n = 200).foreach { text =>
      // escape the template-significant characters the way an author
      // would, then the template must evaluate back to the raw text
      val escaped = text.replace("\\", "\\\\").replace("`", "\\`")
        .replace("$", "\\$")
      val m = s"export default function () { return `$escaped`; }"
      val got = JsMini.load(m).callDefault(VNull)
      assert(got == VStr(text), s"text=${text.map(_.toInt)}")
    }
  }

  test("windowFunnel all four modes agree with brute-force chain " +
      "enumeration on random event sets (equal timestamps included)") {
    import graft.operators.EventFunnel
    import graft.operators.EventFunnel.FunnelMode
    import org.apache.spark.sql.functions._
    val spark = SparkFixture.spark
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    val stepIdx = steps.zipWithIndex.toMap
    val types = steps :+ "other"
    // per user: up to 10 events, timestamps in a 6-tick range so
    // same-ts collisions are COMMON (the hard case for StrictIncrease)
    val evGen = for {
      n <- Gen.choose(0, 10)
      evs <- Gen.listOfN(n, for {
        us <- Gen.choose(0L, 5L)
        t <- Gen.oneOf(types)
      } yield (us, t))
    } yield evs.zipWithIndex.map { case ((us, t), i) => (us, i.toLong, t) }
    val cases = samples(evGen, 250).zipWithIndex
      .map { case (evs, u) => u.toLong -> evs }

    def brute(events: Seq[(Long, Long, String)], window: Long,
        mode: FunnelMode): Int = {
      val sorted = events.sortBy(e => (e._1, e._2))
      val uni =
        if (mode == FunnelMode.StrictOrder) sorted
        else sorted.filter(e => stepIdx.contains(e._3))
      val n = uni.length
      def reach(levels: Int): Boolean = {
        def rec(pos: Int, level: Int, startUs: Long, prevUs: Long,
            prevIdx: Int): Boolean =
          if (level == levels) true
          else (pos until n).exists { i =>
            val e = uni(i)
            stepIdx.get(e._3).contains(level) && {
              val windowOk = level == 0 || e._1 - startUs <= window
              val modeOk = mode match {
                case FunnelMode.Default => true
                case FunnelMode.StrictIncrease => level == 0 || e._1 > prevUs
                case FunnelMode.StrictOrder => level == 0 || i == prevIdx + 1
                case FunnelMode.StrictDedup => level == 0 ||
                  ((prevIdx + 1) until i).forall(j =>
                    stepIdx(uni(j)._3) >= level)
              }
              windowOk && modeOk &&
                rec(i + 1, level + 1,
                  if (level == 0) e._1 else startUs, e._1, i)
            }
          }
        rec(0, 0, 0L, 0L, -1)
      }
      (steps.length to 1 by -1).find(reach).getOrElse(0)
    }

    val df = cases.flatMap { case (u, evs) =>
      evs.map { case (us, ord, t) => (u, us, ord, t) }
    }.toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    for {
      window <- Seq(2L, 100L)
      mode <- Seq(FunnelMode.Default, FunnelMode.StrictIncrease,
        FunnelMode.StrictOrder, FunnelMode.StrictDedup)
    } {
      val got = EventFunnel.windowFunnel(df, "user_id", "ts", "event_id",
        "event_type", steps, window, mode)
        .as[(Long, Int)].collect().toMap
      cases.foreach { case (u, evs) =>
        val want = brute(evs, window, mode)
        val level = got.getOrElse(u, 0)
        assert(level == want,
          s"mode=$mode window=$window user=$u events=$evs: " +
            s"operator=$level brute=$want")
      }
    }
  }

  test("sequencePairCount equals greedy simulation on random sequences") {
    import org.apache.spark.sql.functions._
    val spark = SparkFixture.spark
    import spark.implicits._
    val evGen = for {
      n <- Gen.choose(0, 14)
      evs <- Gen.listOfN(n, for {
        us <- Gen.choose(0L, 6L)
        t <- Gen.oneOf("view", "purchase", "other")
      } yield (us, t))
    } yield evs.zipWithIndex.map { case ((us, t), i) => (us, i.toLong, t) }
    val cases = samples(evGen, 250).zipWithIndex
      .map { case (evs, u) => u.toLong -> evs }
    def greedy(evs: Seq[(Long, Long, String)]): Long = {
      var avail = 0L; var m = 0L
      evs.filter(e => e._3 == "view" || e._3 == "purchase")
        .sortBy(e => (e._1, e._2)).foreach { e =>
          if (e._3 == "view") avail += 1
          else if (avail > 0) { avail -= 1; m += 1 }
        }
      m
    }
    val df = cases.flatMap { case (u, evs) =>
      evs.map { case (us, ord, t) => (u, us, ord, t) }
    }.toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = graft.operators.EventFunnel.sequencePairCount(
      df, "user_id", "ts", "event_id", "event_type", "view", "purchase")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    cases.foreach { case (u, evs) =>
      val want = greedy(evs)
      assert(got.getOrElse(u, 0L) == want,
        s"user=$u events=$evs operator=${got.get(u)} greedy=$want")
    }
  }

  test("codec-config parsers are total on arbitrary bytes: None or a " +
      "value, never a throw") {
    import graft.operators.IsoBmff
    val rnd = new scala.util.Random(1234)
    // pure noise, truncations of VALID records, and bit-flipped valids
    val valids = Seq(
      IsoBmff.AvcEncode.avcC(IsoBmff.AvcEncode.sps(100, 31, 640, 480),
        IsoBmff.AvcEncode.pps()),
      IsoBmff.HevcEncode.hvcC(1, 0, 93,
        IsoBmff.HevcEncode.sps(1, 0, 93, 640, 480)),
      IsoBmff.Av1Encode.av1C(0, 8, 0,
        IsoBmff.Av1Encode.sequenceHeader(0, 8, 0, 640, 480)))
    val cases: Seq[Array[Byte]] =
      (0 until 300).map(_ => Array.fill(rnd.nextInt(64))(rnd.nextInt.toByte)) ++
      valids.flatMap(v => (0 until v.length by 3).map(v.take)) ++
      valids.flatMap { v =>
        (0 until 40).map { _ =>
          val m = v.clone()
          m(rnd.nextInt(m.length)) = rnd.nextInt.toByte
          m
        }
      }
    cases.foreach { b =>
      IsoBmff.parseAvcC(b); IsoBmff.parseHvcC(b); IsoBmff.parseAv1C(b)
      IsoBmff.parseSps(b); IsoBmff.parseHevcSps(b)
      IsoBmff.parseAv1SeqHeader(b)
      IsoBmff.parse(b) // whole-container walk too
    }
    succeed
  }

  test("JsMini.parse is total: arbitrary source raises only the typed " +
      "syntax error, never an internal exception") {
    import graft.functions.JsMini
    val rnd = new scala.util.Random(77)
    val alphabet = "abx01 ._=+-*/(){}[]`'\"$,;:<>!&|?%#\n\\yield class=>"
    val valid =
      """class A { constructor(x) { this.x = x } m() { return this.x } }
        |function* g(n) { for (let i = 0; i < n; i++) yield i; }
        |const t = (s, v) => `${s}-${v}`;
        |export default function (v) { return [...g(3), new A(v).m()]; }
        |""".stripMargin
    val cases: Seq[String] =
      (0 until 400).map(_ => Seq.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      (0 until valid.length by 7).map(valid.take) ++
      (0 until 100).map { _ =>
        val i = rnd.nextInt(valid.length)
        valid.substring(0, i) +
          alphabet(rnd.nextInt(alphabet.length)) + valid.substring(i)
      }
    cases.foreach { src =>
      try { JsMini.parse(src); () }
      catch {
        case _: JsMini.JsSyntaxError => ()
        case e: Throwable =>
          fail(s"non-syntax exception ${e.getClass.getName}: ${e.getMessage}\n" +
            s"source <<<$src>>>")
      }
    }
    succeed
  }

  test("snapshot-diff round-trip law holds on random table pairs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.cdc.{ChangeModel, SnapshotDiff}
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(4242)
    (0 until 12).foreach { trial =>
      def snap(): Seq[(Long, Long, String)] =
        (1 to 40).filter(_ => rnd.nextBoolean()).map(k =>
          (k.toLong, rnd.nextInt(3).toLong, s"v${rnd.nextInt(3)}"))
      val oldRows = snap(); val newRows = snap()
      val oldDf = oldRows.toDF("k", "a", "b")
      val newDf = newRows.toDF("k", "a", "b")
      val diff = SnapshotDiff.changes(oldDf, newDf, Seq("k"), seq = 2L)
      // silence on identical rows: diff row count == classified changes
      val oldM = oldRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val newM = newRows.map(r => r._1 -> ((r._2, r._3))).toMap
      val wantChanges =
        (newM.keySet -- oldM.keySet).size +          // inserts
        (oldM.keySet -- newM.keySet).size +          // deletes
        (oldM.keySet & newM.keySet)
          .count(k => oldM(k) != newM(k))            // updates
      assert(diff.count() == wantChanges, s"trial $trial")
      val rebuilt = ChangeModel.applyChanges(
        oldDf.withColumn("_op", lit(ChangeModel.Insert))
          .withColumn("_seq", lit(1L))
          .unionByName(diff), Seq("k"))
      assert(rebuilt.except(newDf).count() == 0 &&
        newDf.except(rebuilt).count() == 0, s"trial $trial")
    }
  }

  test("attribution equals brute-force per-conversion crediting on " +
      "random event streams") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(21)
    val W = 10L // micros window, small so exclusion paths exercise
    (0 until 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val evs = (0 until n).map { i =>
        val isConv = rnd.nextInt(4) == 0
        (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(4).toLong,
          if (isConv) "conv" else "touch",
          if (isConv) null else s"ch${rnd.nextInt(3)}")
      }
      // brute force over the definition
      val byUser = evs.groupBy(_._3)
      val credit = scala.collection.mutable.Map.empty[String, Array[Long]]
      byUser.values.foreach { ues =>
        val sorted = ues.sortBy(e => (e._2, e._1))
        sorted.filter(_._4 == "conv").foreach { c =>
          val qual = sorted.filter(t => t._4 == "touch" &&
            (t._2 < c._2 || (t._2 == c._2 && t._1 < c._1)) &&
            c._2 - t._2 <= W)
          if (qual.nonEmpty) {
            val m = qual.size.toLong
            qual.zipWithIndex.foreach { case (t, i) =>
              val arr = credit.getOrElseUpdate(t._5, Array(0L, 0L, 0L, 0L))
              arr(0) += 1
              if (i == 0) arr(1) += 1
              if (i == qual.size - 1) arr(2) += 1
              arr(3) += 1000L / m
            }
          }
        }
      }
      val df = evs.toDF("event_id", "us", "user_id", "event_type", "ch")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = graft.operators.EventFunnel.attribution(
          df, "user_id", "ts", "event_id", "event_type", col("ch"),
          "touch", "conv", W)
        .collect().map(r => r.getString(0) ->
          Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(got.keySet == credit.keySet, s"trial $trial")
      got.foreach { case (ch, a) =>
        assert(a.sameElements(credit(ch)),
          s"trial $trial ch=$ch got=${a.toSeq} want=${credit(ch).toSeq}")
      }
    }
  }

  test("PSL registrable domain: idempotent, suffix+1 labels, and total " +
      "on random label stacks") {
    import graft.operators.Psl
    val labelGen = Gen.oneOf("a", "bb", "ccc", "www", "example", "x1")
    val tldGen = Gen.oneOf("com", "uk", "au", "io", "ck", "sometld", "np")
    val midGen = Gen.oneOf("co", "org", "github", "gov", "bar", "plain")
    val hostGen = for {
      depth <- Gen.choose(0, 4)
      front <- Gen.listOfN(depth, labelGen)
      mid <- midGen
      tld <- tldGen
    } yield (front :+ mid :+ tld).mkString(".")
    samples(hostGen, 400).foreach { h =>
      val r = Psl.registrable(h) // total: never throws
      if (r != null) {
        // idempotence: a registrable domain is its own registrable domain
        assert(Psl.registrable(r) == r, s"host=$h r=$r")
        // the result is a suffix of the host with at least 2 segments
        // of meaning: public suffix + one label
        assert(h == r || h.endsWith("." + r), s"host=$h r=$r")
      }
    }
  }

  test("substring-dup stats are partition-independent and bounded by " +
      "window counts on random corpora") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(77)
    val words = Vector("alpha", "beta", "gamma", "delta", "shared phrase",
      "the quick brown fox", "lorem ipsum dolor")
    val docs = (1 to 60).map { i =>
      val n = 3 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val a = Dedup.charWindowDupStats(df, "doc_id", "text", k = 12, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Dedup.charWindowDupStats(df.repartition(7), "doc_id", "text",
        k = 12, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    // invariants: 0 <= dup <= windows; window count matches the formula
    a.foreach { case (id, w, d) =>
      val len = docs(id.toInt - 1)._2.length
      assert(w == (len - 12) / 4 + 1, s"doc $id")
      assert(d >= 0 && d <= w)
    }
  }

  test("kafka read_committed equals a reference transaction simulation " +
      "on random producer interleavings") {
    import graft.cdc.KafkaBatch
    import graft.cdc.KafkaBatch.Encode
    // random logs: 2-3 producers, each committing a random sequence of
    // transactions (some aborted), interleaved batch-wise, with
    // non-transactional batches mixed in
    final case class Txn(pid: Long, batches: Seq[Seq[String]], commit: Boolean)
    val txnGen = for {
      pid <- Gen.choose(1L, 3L)
      nb <- Gen.choose(1, 3)
      batches <- Gen.listOfN(nb, Gen.listOfN(2, Gen.alphaStr.map(_.take(4))))
      commit <- Gen.oneOf(true, false)
    } yield Txn(pid, batches.map(_.toSeq), commit)
    val logGen = Gen.listOfN(4, Gen.either(txnGen,
      Gen.listOfN(2, Gen.alphaStr.map(_.take(4)))))
    samples(logGen, n = 150).foreach { entries =>
      // serialize: transactions append all their batches then their
      // marker (per-producer contiguity is not required by the
      // algorithm, but offsets must be monotone)
      var off = 0L
      val log = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val aborted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val expected = scala.collection.mutable.ArrayBuffer.empty[String]
      entries.foreach {
        case Left(txn) =>
          val first = off
          txn.batches.foreach { recs =>
            log += Encode.batchBytes(off, 1000L + off,
              recs.map(v => (1000L + off, null: Array[Byte],
                v.getBytes("UTF-8"))),
              producerId = txn.pid, transactional = true)
            off += recs.length
          }
          log += Encode.controlBatch(off, 1000L + off, txn.pid, txn.commit)
          off += 1
          if (txn.commit) expected ++= txn.batches.flatten
          else aborted += ((txn.pid, first))
        case Right(recs) =>
          log += Encode.batchBytes(off, 1000L + off,
            recs.map(v => (1000L + off, null: Array[Byte],
              v.getBytes("UTF-8"))))
          expected ++= recs
          off += recs.length
      }
      val got = KafkaBatch.filterCommitted(log.toSeq, aborted.toSeq)
        .map(r => new String(r.value, "UTF-8"))
      assert(got == expected.toSeq,
        s"log of ${entries.size} entries: got $got expected $expected")
    }
  }

  test("Delta action-path codec round-trips any path: " +
      "decodePath(encodePath(p)) == p, segments preserved, output is " +
      "RFC 2396 clean") {
    import graft.sources.DeltaLite
    // segments drawing from the characters hive escaping and URL
    // encoding actually fight over: %, =, :, #, space, unicode, plus
    val segChar = Gen.frequency(
      7 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('%', '=', ':', '#', ' ', '+', '&', '?', '~', '.',
        '-', '_', 'é', '中'))
    val segGen = Gen.nonEmptyListOf(segChar).map(_.mkString)
    val pathGen = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, segGen).map(_.mkString("/")))
    samples(pathGen, n = 500).foreach { p =>
      val enc = DeltaLite.encodePath(p)
      assert(DeltaLite.decodePath(enc) == p, s"round-trip broke for '$p'")
      // the encoded form carries only RFC 2396 pchar literals (the
      // Hadoop Path.toUri keep-set delta-spark writers go through) —
      // no raw space/%/#/?/non-ASCII bytes
      assert(enc.forall(c => c == '/' || c == '%' ||
        c.isLetterOrDigit && c < 128 || "-_.!~*'():@&=+$,;".contains(c)),
        s"unencoded reserved char in '$enc'")
      assert(!enc.exists(c => " #?".contains(c) || c > 127),
        s"raw unsafe char in '$enc'")
      // segment count is preserved ('/' never appears encoded-ambiguous)
      assert(enc.count(_ == '/') == p.count(_ == '/'))
    }
  }
}
