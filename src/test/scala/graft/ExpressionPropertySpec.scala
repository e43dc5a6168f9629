package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashFunctions, VectorFunctions}

/** Property tests for the custom Catalyst expressions: randomized inputs
  * (scalacheck generators, fixed seed for reproducibility) flow through the
  * real DataFrame path — so whole-stage codegen, not just interpreted eval —
  * and every result is compared to an independent driver-side model.
  */
class ExpressionPropertySpec extends SparkSpec {

  private val N = 300

  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val seed0 = Seed(0xA11CE5EEDL)
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, seed0.reseed(i.toLong)))
  }

  // finite doubles away from overflow so the model's arithmetic is exact
  private val finiteD: Gen[Double] = Gen.chooseNum(-1e6, 1e6)

  test("DotProduct matches the driver-side fold on random arrays (codegen path)") {
    val gen = for {
      na <- Gen.chooseNum(0, 20)
      nb <- Gen.chooseNum(0, 20)
      a <- Gen.listOfN(na, finiteD)
      b <- Gen.listOfN(nb, finiteD)
    } yield (a.toArray, b.toArray)
    val data = sample(gen, N)
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = false)),
      StructField("b", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (a, b) => Row(a.toSeq, b.toSeq) }, 4),
      schema)
    val got = df.select(VectorFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getDouble(0))
    got.zip(data).foreach { case (g, (a, b)) =>
      var acc = 0d
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i) * b(i); i += 1 }
      assert(g == acc, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("DotProduct: any null element in the overlapping prefix nulls the result") {
    // INDEPENDENT lengths: a null sitting past the shorter array's end
    // must be ignored — equal-length-only generation left that boundary
    // unreachable (a max(len)-scanning regression would ship undetected)
    val gen = for {
      na <- Gen.chooseNum(1, 12)
      nb <- Gen.chooseNum(1, 12)
      a <- Gen.listOfN(na, Gen.option(finiteD))
      b <- Gen.listOfN(nb, Gen.option(finiteD))
    } yield (a.toArray, b.toArray)
    val data = sample(gen, N)
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        data.map { case (a, b) =>
          Row(a.toSeq.map(_.map(Double.box).orNull), b.toSeq.map(_.map(Double.box).orNull))
        }, 4),
      schema)
    val got = df.select(VectorFunctions.vecDot(col("a"), col("b")).as("d")).collect()
    got.zip(data).foreach { case (row, (a, b)) =>
      // model: fold stops at the FIRST null encountered in the loop,
      // scanning only the overlapping prefix — nulls beyond min(len) are
      // ignored by construction
      var expectNull = false
      var acc = 0d
      var i = 0
      var done = false
      val nOv = math.min(a.length, b.length)
      while (i < nOv && !done) {
        (a(i), b(i)) match {
          case (Some(x), Some(y)) => acc += x * y
          case _ => expectNull = true; done = true
        }
        i += 1
      }
      if (expectNull) assert(row.isNullAt(0), s"a=${a.toSeq} b=${b.toSeq}")
      else assert(row.getDouble(0) == acc, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("MinhashSignature matches the per-perm affine model on random shingle sets") {
    val p = 2147483647L
    val aConsts = (0 until 32).map(i => (i * 2654435761L + 1) % p).map(math.abs)
    val bConsts = (0 until 32).map(i => (i * 40503L + 7) % p).map(math.abs)
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1))
    } yield xs.toArray
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("shs", ArrayType(LongType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(xs => Row(xs.toSeq)), 4), schema)
    val got = df.select(
      HashFunctions.minhashSignature(col("shs"), aConsts, bConsts, p).as("mh"))
      .collect().map(_.getSeq[Long](0))
    got.zip(data).foreach { case (sig, xs) =>
      val model = (0 until 32).map { j =>
        if (xs.isEmpty) Long.MaxValue
        else xs.map(x => ((x % p) * aConsts(j) + bConsts(j)) % p).min
      }
      assert(sig == model, s"xs=${xs.toSeq}")
    }
  }

  test("SimhashBits matches the driver-side md5 vote model on random word lists") {
    // empty words included: split(text, '\\s+') produces them on real
    // input with leading whitespace, and the engine's numBytes > 0 skip
    // branch (mirrored by the model's .nonEmpty filter) must be exercised
    val word = Gen.frequency(
      9 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      1 -> Gen.const(""))
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, word)
    } yield ws
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("ws", ArrayType(StringType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(ws => Row(ws)), 4), schema)
    val got = df.select(HashFunctions.simhashBits(col("ws")).as("h"))
      .collect().map(_.getLong(0))
    got.zip(data).foreach { case (h, ws) =>
      val sums = new Array[Int](60)
      ws.filter(_.nonEmpty).foreach { w =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val x = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        (0 until 60).foreach(j => sums(j) += (if (((x >> j) & 1L) == 1L) 1 else -1))
      }
      val model = (0 until 60).map(j => if (sums(j) > 0) 1L << j else 0L).sum
      assert(h == model, s"ws=$ws")
    }
  }

  test("SortedIntersectSize matches array_intersect on random sorted distinct sets") {
    val gen = for {
      na <- Gen.chooseNum(0, 50)
      nb <- Gen.chooseNum(0, 50)
      // small value domain forces real overlap
      a <- Gen.listOfN(na, Gen.chooseNum(0L, 80L))
      b <- Gen.listOfN(nb, Gen.chooseNum(0L, 80L))
    } yield (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
    val data = sample(gen, N)
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = false)),
      StructField("b", ArrayType(LongType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (a, b) => Row(a.toSeq, b.toSeq) }, 4), schema)
    val got = df.select(
      HashFunctions.sortedIntersectSize(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("m"))
      .collect()
    got.zip(data).foreach { case (r, (a, b)) =>
      assert(r.getLong(0) == r.getLong(1), s"a=${a.toSeq} b=${b.toSeq}")
      assert(r.getLong(0) == a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("SortedFilterBroadcast ≡ array_intersect / array_except against the broadcast set") {
    val gen = for {
      na <- Gen.chooseNum(0, 50)
      a <- Gen.listOfN(na, Gen.chooseNum(0L, 80L))
    } yield a.distinct.sorted.toArray
    val data = sample(gen, N)
    val hot = Array(3L, 7L, 20L, 21L, 55L, 80L) // sorted, overlapping the domain
    val bc = spark.sparkContext.broadcast(hot)
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(a => Row(a.toSeq)), 4), schema)
    val got = df.select(
      HashFunctions.sortedFilterBroadcast(col("a"), bc, keep = true).as("kept"),
      HashFunctions.sortedFilterBroadcast(col("a"), bc, keep = false).as("dropped"),
      array_intersect(col("a"), lit(hot)).as("ik"),
      array_except(col("a"), lit(hot)).as("id"))
      .collect()
    got.zip(data).foreach { case (r, a) =>
      // input is sorted distinct, so array_intersect/except (which keep
      // first-arg order) are the exact reference — values AND order
      assert(r.getSeq[Long](0) == r.getSeq[Long](2), s"keep diverged on ${a.toSeq}")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"drop diverged on ${a.toSeq}")
      assert(r.getSeq[Long](0) ++ r.getSeq[Long](1) == a.toSeq.sorted.filter(hot.contains) ++ a.toSeq.sorted.filterNot(hot.contains))
    }
    // empty broadcast set: keep = [], drop = identity
    val bcEmpty = spark.sparkContext.broadcast(Array.empty[Long])
    val e = df.select(
      HashFunctions.sortedFilterBroadcast(col("a"), bcEmpty, keep = true).as("k"),
      HashFunctions.sortedFilterBroadcast(col("a"), bcEmpty, keep = false).as("d")).collect()
    e.zip(data).foreach { case (r, a) =>
      assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1) == a.toSeq)
    }
  }

  test("PqResidual guards malformed codes: short, null element, out-of-range -> null") {
    val dim = 8; val m = 4; val k = 4; val sub = dim / m
    val cb = Array.tabulate(m * k * sub)(_.toDouble / 7d)
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = false)),
      StructField("c", ArrayType(IntegerType, containsNull = true))))
    val rows = Seq(
      Row(Seq.fill(dim)(1.0d), Seq(0, 1, 2, 3)),          // well-formed
      Row(Seq.fill(dim)(1.0d), Seq(0, 1)),                // shorter than m
      Row(Seq.fill(dim)(1.0d), Seq(0, null, 2, 3)),       // null element
      Row(Seq.fill(dim)(1.0d), Seq(0, 1, 2, k)),          // code == k (out of range)
      Row(Seq.fill(dim)(1.0d), Seq(0, 1, -1, 3)))         // negative code
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = df.select(VectorFunctions.pqResidual(col("v"), col("c"), dim, m, k, cb).as("r"))
      .collect()
    assert(got(0).getSeq[Double](0) != null && got(0).getSeq[Double](0).length == dim)
    (1 to 4).foreach(i => assert(got(i).isNullAt(0), s"row $i should null-propagate"))
  }

  test("PqEncode matches the naive full-distance argmin on random vectors (codegen path)") {
    val dim = 16; val m = 4; val k = 8; val sub = dim / m
    val cbGen = Gen.listOfN(m * k * sub, finiteD)
    val codebook = sample(cbGen, 1).head.toArray
    val gen = Gen.listOfN(dim, finiteD).map(_.toArray)
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(v => Row(v.toSeq)), 4), schema)
    val got = df.select(VectorFunctions.pqEncode(col("v"), dim, m, k, codebook).as("c"))
      .collect().map(_.getSeq[Int](0))
    got.zip(data).foreach { case (codes, v) =>
      (0 until m).foreach { s =>
        // naive model: full squared distance, first minimum wins
        val dists = (0 until k).map { c =>
          (0 until sub).map { j =>
            val d = v(s * sub + j) - codebook((s * k + c) * sub + j); d * d
          }.sum
        }
        val want = dists.indexOf(dists.min)
        assert(codes(s) == want, s"subspace $s: got ${codes(s)}, want $want (v=${v.toSeq})")
      }
    }
  }

  test("PqResidual equals the zip_with/element_at formulation bit-for-bit (codegen path)") {
    val dim = 16; val m = 4; val k = 8; val sub = dim / m
    val codebook = sample(Gen.listOfN(m * k * sub, finiteD), 1).head.toArray
    val data = sample(Gen.listOfN(dim, finiteD).map(_.toArray), N)
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(v => Row(v.toSeq)), 4), schema)
      .withColumn("c", VectorFunctions.pqEncode(col("v"), dim, m, k, codebook))
    // the pre-optimization expression tree: per-element codebook lookup
    // via dim copies of the literal, then zip_with subtract
    val recon = org.apache.spark.sql.functions.array((0 until dim).map { i =>
      val s = i / sub; val j = i % sub
      element_at(lit(codebook), (lit(s * k) + col("c").getItem(s)) * sub + j + 1)
    }: _*)
    val want = zip_with(col("v"), recon, (x, r) => x - r)
    val rows = df.select(
      VectorFunctions.pqResidual(col("v"), col("c"), dim, m, k, codebook).as("got"),
      want.as("want")).collect()
    rows.foreach { r =>
      val got = r.getSeq[Double](0); val w = r.getSeq[Double](1)
      assert(got.size == dim && w.size == dim)
      got.zip(w).zipWithIndex.foreach { case ((g, x), i) =>
        assert(java.lang.Double.doubleToRawLongBits(g) ==
          java.lang.Double.doubleToRawLongBits(x), s"elem $i: got $g want $x")
      }
    }
    // float input path: same kernel through the float->double widening
    val fschema = StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = false))))
    val fdf = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(v => Row(v.map(_.toFloat).toSeq)), 4), fschema)
      .withColumn("c", VectorFunctions.pqEncode(col("v"), dim, m, k, codebook))
    val frows = fdf.select(
      VectorFunctions.pqResidual(col("v"), col("c"), dim, m, k, codebook).as("got"),
      zip_with(transform(col("v"), x => x.cast("double")), recon, (x, r) => x - r).as("want"))
      .collect()
    frows.foreach { r =>
      r.getSeq[Double](0).zip(r.getSeq[Double](1)).foreach { case (g, x) =>
        assert(java.lang.Double.doubleToRawLongBits(g) ==
          java.lang.Double.doubleToRawLongBits(x))
      }
    }
  }

  test("NearestCentroid matches the independent fold model bit-for-bit (codegen path)") {
    val dim = 16
    val k = 5
    val cent = sample(Gen.listOfN(k * dim, finiteD), 1).head.toArray
    val data = sample(Gen.listOfN(dim, finiteD), N).map(_.toArray)
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(v => Row(v.toSeq)), 4), schema)
    val got = df.select(VectorFunctions.nearestCentroid(col("v"), dim, cent).as("nc"))
      .select(col("nc.cluster"), col("nc.dist"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    data.zip(got).foreach { case (v, (gc, gd)) =>
      // independent model: the exact fold sequence, first-min tie-break
      var dvv = 0d; v.foreach(x => dvv += x * x)
      var bj = -1; var bd = 0d
      (0 until k).foreach { j =>
        var dvc = 0d; var cc = 0d
        (0 until dim).foreach { i =>
          dvc += v(i) * cent(j * dim + i)
          cc += cent(j * dim + i) * cent(j * dim + i)
        }
        val d = (dvv - 2d * dvc) + cc
        if (bj < 0 || d < bd) { bj = j; bd = d }
      }
      assert(gc == bj && gd == bd, s"fused ($gc, $gd) != model ($bj, $bd)")
    }
  }

  test("BpeEncode: codegen path matches the driver encoder; tokens partition each word") {
    // words over a tiny alphabet so merges actually fire, plus mixed case
    // and an astral-plane char (code-point splitting must survive the
    // UTF8String boundary)
    val word = for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "B", "🦦"))
    } yield cs.mkString
    val textGen = for {
      n <- Gen.chooseNum(0, 6)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val pairGen = for {
      x <- Gen.oneOf("a", "b", "c", "ab", "bc", "abc", "🦦")
      y <- Gen.oneOf("a", "b", "c", "ab", "🦦")
    } yield x + " " + y
    val mergesGen = for {
      n <- Gen.chooseNum(0, 8)
      ms <- Gen.listOfN(n, pairGen)
    } yield ms.distinct.toArray

    val texts = sample(textGen, N)
    sample(mergesGen, 8).foreach { merges =>
      val ranks = graft.ml.BpeTokenizer.ranksOf(merges)
      val schema = StructType(Seq(StructField("t", StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(texts.map(Row(_)), 4), schema)
      val got = df.select(graft.functions.TokenizerFunctions.bpeEncode(col("t"), merges))
        .collect().map(_.getSeq[String](0).toList)
      texts.zip(got).foreach { case (t, toks) =>
        // plumbing: expression ≡ driver encoder (same fn through codegen +
        // UTF8String round-trip)
        assert(toks == graft.ml.BpeTokenizer.encode(t, ranks).toList, s"text '$t'")
        // algorithm: tokens partition the lowercased words — merging only
        // concatenates, never drops or invents characters
        assert(toks.mkString == graft.ml.BpeTokenizer.words(t).mkString, s"text '$t'")
      }
    }
  }

  test("vec_sum aggregates element-wise across partitions like the driver-side model") {
    val dim = 8
    val gen = for {
      key <- Gen.chooseNum(0, 5)
      xs <- Gen.listOfN(dim, finiteD)
    } yield (key, xs.toArray)
    val data = sample(gen, N)
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map { case (k, v) => Row(k, v.toSeq) }, 4), schema)
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("psumin")
    val got = spark.sql(s"SELECT k, vec_sum(v, $dim) AS s FROM psumin GROUP BY k")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val model = data.groupBy(_._1).map { case (k, rows) =>
      k -> (0 until dim).map(i => rows.map(_._2(i)).sum)
    }
    model.foreach { case (k, exp) =>
      val g = got(k)
      // merge order differs across partitions -> tolerance, not bit equality
      exp.indices.foreach(i => assert(math.abs(g(i) - exp(i)) < 1e-6 * (1 + math.abs(exp(i))),
        s"k=$k i=$i got=${g(i)} exp=${exp(i)}"))
    }
  }

  // ---- probe-assignment kernels vs an independent driver model -------------

  /** The documented TopProbeLabels contract, re-implemented independently:
    * strict-fold dots, cos = dvq/(sqrt(cc)*sqrt(qq)), Spark's DoubleType
    * floor (through a long cast: NaN→0, ±Inf→±Long.Max), negation, SQL
    * double ordering (-0.0 == +0.0, NaN last), label-asc ties.
    */
  private def fl6Model(x: Double): Double = math.floor(x * 1e6).toLong / 1e6
  private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)
  private def strictDot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0d; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def negScores(q: Array[Double], cents: Array[Array[Double]]): Array[Double] = {
    val sq = math.sqrt(strictDot(q, q))
    cents.map(c => -fl6Model(strictDot(c, q) / (math.sqrt(strictDot(c, c)) * sq)))
  }
  private def rankedSlice(neg: Array[Double], idx: Seq[Int], labels: Array[Int], p: Int): Seq[Int] =
    idx.sortWith { (a, b) =>
      val c = cmpD(neg(a), neg(b)); if (c != 0) c < 0 else a < b
    }.take(p).map(labels)

  test("TopProbeLabels matches the driver model on random vectors incl. zero/NaN (codegen path)") {
    val dim = 8
    val cfgGen = for {
      nC <- Gen.chooseNum(1, 10)
      cents <- Gen.listOfN(nC, Gen.listOfN(dim, finiteD))
      np <- Gen.chooseNum(1, 12)
    } yield (cents.map(_.toArray).toArray, np)
    val vecGen = Gen.frequency(
      7 -> Gen.listOfN(dim, Gen.chooseNum(-100f, 100f)),
      1 -> Gen.const(List.fill(dim)(0f))) // zero vector -> NaN cosines -> label-asc ties
    sample(cfgGen, 6).zipWithIndex.foreach { case ((cents, np), cfgI) =>
      val labels = cents.indices.map(i => i * 3 + 1).toArray // sorted, non-contiguous
      val vecs = sample(vecGen, 60).map(_.toArray)
      val schema = StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = false))))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs.map(v => Row(v.toSeq)), 3), schema)
      val got = df.select(VectorFunctions.topProbeLabels(
        col("v"), dim, labels, cents.flatten, np).as("p"))
        .collect().map(_.getSeq[Int](0))
      got.zip(vecs).foreach { case (g, vf) =>
        val q = vf.map(_.toDouble)
        val exp = rankedSlice(negScores(q, cents), cents.indices, labels, math.min(np, cents.length))
        assert(g == exp, s"cfg=$cfgI np=$np v=${vf.toSeq} got=$g exp=$exp")
      }
    }
  }

  test("ShingleIds (both sort modes) ≡ the former HOF chain elementwise on random text") {
    // word mix exercises every branch: empties (leading-whitespace split
    // artifacts), repeats (distinct dedup), multi-byte UTF-8 (byte-level
    // md5 must equal md5 of the joined STRING), and doc lengths straddling
    // the size(w) < k cutoff
    val word = Gen.frequency(
      6 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      2 -> Gen.oneOf("the", "a", "наб", "🦦x"),
      1 -> Gen.const(""))
    val gen = for {
      n <- Gen.chooseNum(0, 14)
      ws <- Gen.listOfN(n, word)
    } yield ws
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("w", ArrayType(StringType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(ws => Row(ws)), 4), schema)
    Seq(1, 3, 5).foreach { k =>
      def hof(sorted: Boolean) = {
        val core =
          s"""array_distinct(transform(
             | filter(
             |  CASE WHEN size(w) >= $k
             |   THEN transform(sequence(1, size(w) - $k + 1),
             |     i -> array_join(slice(w, i, $k), ' '))
             |   ELSE CAST(array() AS ARRAY<STRING>) END,
             |  s -> length(s) > 0),
             | s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)))"""
            .stripMargin.replace("\n", "")
        expr(if (sorted) s"array_sort($core)" else core)
      }
      val got = df.select(
        graft.functions.ShingleFunctions.shingleIds(col("w"), k, sorted = false).as("u"),
        graft.functions.ShingleFunctions.shingleIds(col("w"), k, sorted = true).as("s"),
        hof(sorted = false).as("hu"),
        hof(sorted = true).as("hs")).collect()
      got.zip(data).foreach { case (r, ws) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](2), s"k=$k unsorted ws=$ws")
        assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"k=$k sorted ws=$ws")
      }
    }
  }

  test("GramBucketCounts ≡ the former HOF uni+bigram pipeline elementwise on random words") {
    // same adversarial word mix as the ShingleIds pin: empties (split
    // artifacts — dropped BEFORE bigram pairing), repeats (count > 1),
    // multi-byte UTF-8 (byte-level md5 must equal md5 of the joined
    // string), and lengths 0/1 (no bigrams)
    val word = Gen.frequency(
      6 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      2 -> Gen.oneOf("the", "a", "наб", "🦦x"),
      1 -> Gen.const(""))
    val gen = for {
      n <- Gen.chooseNum(0, 14)
      ws <- Gen.listOfN(n, word)
    } yield ws
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("w", ArrayType(StringType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(ws => Row(ws)), 4), schema)
    Seq(7, 512).foreach { b =>
      // the former pipeline, elementwise: filtered words → uni+bigram list
      // (unigrams first) → pmod(md5Id, b) per gram — the per-gram bucket
      // SEQUENCE, from which the expected map is folded in order
      val hofBuckets = expr(
        s"""transform(
           | concat(fw, if(size(fw) >= 2,
           |  zip_with(slice(fw, 1, size(fw) - 1), slice(fw, 2, size(fw) - 1),
           |   (x, y) -> concat(x, ' ', y)),
           |  CAST(array() AS ARRAY<STRING>))),
           | g -> pmod(CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT),
           |   CAST($b AS BIGINT)))""".stripMargin.replace("\n", ""))
      val got = df
        .withColumn("fw", expr("filter(w, t -> length(t) > 0)"))
        .select(
          graft.functions.ShingleFunctions.gramBucketCounts(col("w"), b).as("m"),
          map_keys(graft.functions.ShingleFunctions.gramBucketCounts(col("w"), b)).as("mk"),
          hofBuckets.as("hb")).collect()
      got.zip(data).foreach { case (r, ws) =>
        val seq = r.getSeq[Long](2)
        val exp = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
        seq.foreach(k => exp.update(k, exp.getOrElse(k, 0L) + 1L))
        assert(r.getMap[Long, Long](0).toMap == exp.toMap, s"b=$b ws=$ws")
        // key order pinned: first occurrence over unigrams-then-bigrams
        assert(r.getSeq[Long](1) == exp.keys.toSeq, s"b=$b key order ws=$ws")
      }
    }
  }

  test("TokenGramCounts ≡ the former HOF explode+count pipeline elementwise on random words") {
    val word = Gen.frequency(
      6 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      2 -> Gen.oneOf("the", "a", "наб", "🦦x"),
      1 -> Gen.const(""))
    val gen = for {
      n <- Gen.chooseNum(0, 14)
      ws <- Gen.listOfN(n, word)
    } yield ws
    val data = sample(gen, N)
    val schema = StructType(Seq(StructField("w", ArrayType(StringType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(ws => Row(ws)), 4), schema)
    Seq(1, 2, 3).foreach { n =>
      // the former pipeline elementwise: filtered words → space-joined
      // n-gram SEQUENCE, from which the expected counts fold in order
      val hofGrams = expr(
        s"""CASE WHEN size(fw) >= $n
           | THEN transform(sequence(1, size(fw) - $n + 1),
           |   i -> array_join(slice(fw, i, $n), ' '))
           | ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin.replace("\n", ""))
      val got = df
        .withColumn("fw", expr("filter(w, t -> length(t) > 0)"))
        .select(
          graft.functions.ShingleFunctions.tokenGramCounts(col("w"), n).as("m"),
          map_keys(graft.functions.ShingleFunctions.tokenGramCounts(col("w"), n)).as("mk"),
          hofGrams.as("hg")).collect()
      got.zip(data).foreach { case (r, ws) =>
        val seq = r.getSeq[String](2)
        val exp = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        seq.foreach(g => exp.update(g, exp.getOrElse(g, 0L) + 1L))
        assert(r.getMap[String, Long](0).toMap == exp.toMap, s"n=$n ws=$ws")
        // key order pinned: first occurrence in sliding order
        assert(r.getSeq[String](1) == exp.keys.toSeq, s"n=$n key order ws=$ws")
      }
    }
  }

  test("CharEntropyStats ≡ the former split('')+aggregate chain bit-for-bit on random text") {
    val textGen = Gen.frequency(
      6 -> Gen.listOfN(40, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '!', 'é', 'ж'))).map(_.mkString),
      2 -> Gen.nonEmptyListOf(Gen.const('a')).map(_.mkString), // zero-entropy spam
      1 -> Gen.const(""),
      1 -> Gen.const("🦦🦦a🦦")) // astral plane: code-point counting
    val data = sample(textGen, N)
    val schema = StructType(Seq(StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(Row(_)), 4), schema)
    val got = df.select(
      graft.functions.ShingleFunctions.charEntropyStats(col("text")).as("st"),
      when(length(col("text")) === 0, array().cast("array<string>"))
        .otherwise(split(col("text"), "")).as("cs"))
      .select(col("st.n_chars"), col("st.raw_h"),
        size(col("cs")).cast("long").as("hn"),
        expr(
          """CASE WHEN size(cs) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            | aggregate(array_distinct(cs), CAST(0.0 AS DOUBLE),
            |  (acc, c) -> acc - (CAST(size(filter(cs, x -> x = c)) AS DOUBLE) / CAST(size(cs) AS DOUBLE))
            |    * ln(CAST(size(filter(cs, x -> x = c)) AS DOUBLE) / CAST(size(cs) AS DOUBLE)))
            | END""".stripMargin.replace("\n", "")).as("hh")).collect()
    got.zip(data).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(2), s"n_chars text='$t'")
      // bit-for-bit: both folds add the same terms in first-occurrence order
      assert(r.getDouble(1) == r.getDouble(3), s"raw_h text='$t'")
    }
  }

  test("TopProbeLabelsHier matches the two-stage driver model on random hierarchies") {
    val dim = 8
    val cfgGen = for {
      nC <- Gen.chooseNum(1, 10)
      cents <- Gen.listOfN(nC, Gen.listOfN(dim, finiteD))
      nS <- Gen.chooseNum(1, 4)
      sups <- Gen.listOfN(nS, Gen.listOfN(dim, finiteD))
      cellSup <- Gen.listOfN(nC, Gen.chooseNum(0, nS - 1))
      np <- Gen.chooseNum(1, 6)
      sp <- Gen.chooseNum(1, 3)
    } yield (cents.map(_.toArray).toArray, sups.map(_.toArray).toArray,
      cellSup.toArray, np, sp)
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-100f, 100f))
    sample(cfgGen, 6).zipWithIndex.foreach { case ((cents, sups, cellSup, np, sp), cfgI) =>
      val labels = cents.indices.map(i => i * 2 + 5).toArray
      val vecs = sample(vecGen, 40).map(_.toArray)
      val schema = StructType(Seq(StructField("v", ArrayType(FloatType, containsNull = false))))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vecs.map(v => Row(v.toSeq)), 3), schema)
      val got = df.select(VectorFunctions.topProbeLabelsHier(
        col("v"), dim, sups.flatten, labels, cellSup, cents.flatten, np, sp).as("p"))
        .collect().map(_.getSeq[Int](0))
      got.zip(vecs).foreach { case (g, vf) =>
        val q = vf.map(_.toDouble)
        val negS = negScores(q, sups)
        val chosen = sups.indices.sortWith { (a, b) =>
          val c = cmpD(negS(a), negS(b)); if (c != 0) c < 0 else a < b
        }.take(math.min(sp, sups.length)).toSet
        val member = cents.indices.filter(ci => chosen(cellSup(ci)))
        val negC = negScores(q, cents)
        val exp = rankedSlice(negC, member, labels, math.min(np, member.length))
        assert(g == exp, s"cfg=$cfgI np=$np sp=$sp v=${vf.toSeq} got=$g exp=$exp")
      }
    }
  }
}
