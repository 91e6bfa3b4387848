package graft

import graft.catalog.VersionedCatalog
import graft.pipeline.Transforms
import graft.sources.Jsonl
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style suites (SURVEY.md §5.2(3)) — ScalaCheck generators
  * driven deterministically (fixed seed) so failures are reproducible. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("JSONL round-trip ≡ identity for arbitrary printable records") {
    val s = spark
    import s.implicits._
    val recGen = for {
      id <- Gen.choose(0L, Long.MaxValue)
      name <- Gen.listOfN(12, Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf(' ', '"', '\\', '\n', '\t', 'ü', '→')))
        .map(_.mkString)
    } yield (id, name)
    val rows = samples(recGen, 60)
    withTempDir { dir =>
      Jsonl.write(rows.toDF("id", "name"), s"$dir/rt")
      val back = Jsonl.read(spark, s"$dir/rt",
        StructType.fromDDL("id BIGINT, name STRING"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(back.sorted.toSeq == rows.sorted)
    }
  }

  test("catalog versions are 1..n monotonic and content-stable for any write sequence") {
    val s = spark
    import s.implicits._
    val batchesGen = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(Gen.choose(0, 1000))))
    samples(batchesGen, 6).foreach { batches =>
      withTempDir { dir =>
        val cat = new VersionedCatalog(spark, dir.toString)
        val written = batches.zipWithIndex.map { case (b, i) =>
          val v = cat.writeNext("t", b.toDF("x"))
          assert(v == i + 1)
          v -> b.sorted
        }
        assert(cat.versions("t") == (1 to batches.size))
        // every committed version still reads back its own content
        written.foreach { case (v, expect) =>
          val got = cat.read("t", v, Some(StructType.fromDDL("x INT")))
            .collect().map(_.getInt(0)).sorted.toSeq
          assert(got == expect)
        }
      }
    }
  }

  test("retry succeeds iff failures ≤ maxRetries, with exactly failures+1 attempts") {
    val cases = for {
      failures <- Gen.choose(0, 4)
      maxRetries <- Gen.choose(0, 4)
    } yield (failures, maxRetries)
    samples(cases, 40).foreach { case (failures, maxRetries) =>
      var calls = 0
      def body: String = {
        calls += 1
        if (calls <= failures) throw new RuntimeException(s"fail $calls") else "ok"
      }
      if (failures <= maxRetries) {
        assert(Transforms.retry(Transforms.RetryConfig(maxRetries))(body) == "ok")
        assert(calls == failures + 1)
      } else {
        intercept[RuntimeException](
          Transforms.retry(Transforms.RetryConfig(maxRetries))(body))
        assert(calls == maxRetries + 1)
      }
    }
  }

  test("tokenizer invariants: tokens are lowercase alnum; re-tokenizing is identity") {
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', ',', '.', '!', 'Ü', '-', '\n')))
      .map(_.mkString)
    samples(textGen, 200).foreach { text =>
      val toks = graft.functions.TextKernels
        .tokenizeAsciiLower(UTF8String.fromString(text))
      val strs = (0 until toks.numElements()).map(toks.getUTF8String(_).toString)
      assert(strs.forall(t => t.nonEmpty && t.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))))
      // idempotence: tokenizing the joined tokens yields the same tokens
      val again = graft.functions.TextKernels
        .tokenizeAsciiLower(UTF8String.fromString(strs.mkString(" ")))
      val strs2 = (0 until again.numElements()).map(again.getUTF8String(_).toString)
      assert(strs2 == strs)
    }
  }

  test("compiled tokenizer ≡ declarative HOF formulation on arbitrary text") {
    val s = spark
    import s.implicits._
    val textGen = Gen.listOfN(60, Gen.oneOf(
      Gen.alphaNumChar, Gen.asciiPrintableChar, Gen.oneOf('é', '中', '\t', '\n')))
      .map(_.mkString)
    val texts = samples(textGen, 300)
    val df = texts.toDF("text")
    val both = df.select(
        graft.ext.TextDsl.tokens(org.apache.spark.sql.functions.col("text")).as("k"),
        graft.ext.TextDsl.tokensHof(org.apache.spark.sql.functions.col("text")).as("h"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("compiled hashedBow ≡ HOF fold for arbitrary token lists, and is linear") {
    val s = spark
    import s.implicits._
    val tokGen = Gen.listOfN(5,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中'))).map(_.mkString)
    val listsGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, tokGen))
    val lists = samples(listsGen, 200)
    val df = lists.toDF("tk")
    val both = df.select(
        graft.functions.HashFunctions.hashedBow(
          org.apache.spark.sql.functions.col("tk"), 16).as("k"),
        graft.ext.TextDsl.hashedBowHof("tk", 16).as("h"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // linearity: bow(a ++ b) = bow(a) + bow(b) elementwise — the property
    // that makes the vectors mergeable across any doc split
    val pairs = samples(Gen.zip(listsGen, listsGen), 50)
    val lin = pairs.toDF("a", "b").select(
        graft.functions.HashFunctions.hashedBow(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")), 16).as("ab"),
        graft.functions.HashFunctions.hashedBow(
          org.apache.spark.sql.functions.col("a"), 16).as("va"),
        graft.functions.HashFunctions.hashedBow(
          org.apache.spark.sql.functions.col("b"), 16).as("vb"))
      .collect()
    lin.foreach { r =>
      val ab = r.getSeq[Long](0); val va = r.getSeq[Long](1); val vb = r.getSeq[Long](2)
      assert(ab == va.zip(vb).map { case (x, y) => x + y })
    }
  }

  test("top_k ≡ global sort + take(k) for arbitrary data and k") {
    val s = spark
    import s.implicits._
    val cases = for {
      k <- Gen.choose(1, 8)
      vals <- Gen.listOf(Gen.choose(-50L, 50L))
    } yield (k, vals)
    samples(cases, 25).foreach { case (k, vals) =>
      val df = vals.toDF("v").repartition(5)
      val got = df.agg(graft.functions.AggFunctions.topK(
          org.apache.spark.sql.functions.col("v"), k).as("top"))
        .head().getSeq[Long](0)
      assert(got == vals.sorted(Ordering[Long].reverse).take(k))
    }
  }

  test("asOfLast matches a brute-force as-of on random event/fact sets") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, struct}
    val caseGen = for {
      left <- Gen.listOf(for {
        k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 40L)
      } yield (k, t)).suchThat(_.nonEmpty)
      right <- Gen.listOf(for {
        k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 40L); v <- Gen.choose(0L, 9L)
      } yield (k, t, v))
    } yield (left.distinct, right.distinct)
    samples(caseGen, 15).foreach { case (left, right) =>
      val expect = left.map { case (k, t) =>
        val m = right.filter(r => r._1 == k && r._2 <= t)
        (k, t) -> (if (m.isEmpty) None else Some(m.map(r => (r._2, r._3)).max))
      }.toMap
      val got = graft.operators.Joins.asOfLast(
          left.toDF("k", "t"), right.toDF("fk", "ft", "v"),
          leftKey = col("k"), rightKey = col("fk"),
          leftTs = col("t"), rightTs = col("ft"),
          leftPayload = struct(col("t").as("lt")),
          rightPayload = struct(col("ft"), col("v")),
          rightOrder = Seq(col("v")))
        .collect().map { r =>
          (r.getLong(0), r.getLong(1)) ->
            (if (r.isNullAt(3)) None
             else Some((r.getStruct(3).getLong(0), r.getStruct(3).getLong(1))))
        }.toMap
      assert(got == expect, s"left=$left right=$right")
    }
  }

  test("cappedBuckets == plain bucket group-by, minus exactly the oversized buckets") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, collect_list, size, sort_array}
    val dataGen = Gen.listOf(for {
      k <- Gen.choose(0L, 8L); m <- Gen.choose(0L, 40L)
    } yield (k, m)).map(_.distinct).suchThat(_.nonEmpty)
    samples(dataGen, 12).foreach { rows =>
      val df = rows.toDF("k", "m")
      val maxBucket = 4
      val naive = df.groupBy(col("k"))
        .agg(sort_array(collect_list(col("m"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val capped = graft.operators.NearDup.cappedBuckets(
          df, Seq("k"), "m", maxBucket, s"prop_cap_${rows.hashCode.abs}")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(capped == naive.filter(_._2.length <= maxBucket),
        s"rows=$rows")
    }
  }

  test("catalog merge == reference map-merge for random base/update sets") {
    val s = spark
    import s.implicits._
    val caseGen = for {
      base <- Gen.listOf(Gen.zip(Gen.choose(0, 15), Gen.identifier))
        .map(_.distinctBy(_._1)).suchThat(_.nonEmpty)
      ups <- Gen.listOf(Gen.zip(Gen.choose(0, 15), Gen.identifier))
        .map(_.distinctBy(_._1))
    } yield (base, ups)
    samples(caseGen, 6).foreach { case (base, ups) =>
      withTempDir { dir =>
        val kv = org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")
        val cat = new graft.catalog.VersionedCatalog(spark, dir.toString)
        cat.writeNext("t", base.toDF("k", "v"))
        cat.merge("t", ups.toDF("k", "v"), Seq("k"), Some(kv))
        val got = cat.latest("t", Some(kv)).collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        assert(got == (base.toMap ++ ups.toMap), s"base=$base ups=$ups")
      }
    }
  }

  test("minhash signature values are < P and permutation-count wide") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val setGen = Gen.listOf(Gen.identifier).map(_.distinct)
    samples(setGen, 60).foreach { shingles =>
      val arr = new GenericArrayData(
        shingles.map(s => UTF8String.fromString(s): AnyRef).toArray)
      val sig = graft.functions.HashKernels.minhashSig(arr, 12)
      assert(sig.numElements() == 12)
      val vals = (0 until 12).map(sig.getLong)
      assert(vals.forall(v => v >= 0 && v <= graft.functions.HashKernels.P))
      if (shingles.isEmpty)
        assert(vals.forall(_ == graft.functions.HashKernels.P))
    }
  }

  test("pq encode/lut/adc agree on random vectors: own-code ADC == err_e9, " +
    "lut row min at the chosen code, any-code ADC >= own-code ADC") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val books = graft.functions.VectorIndexFunctions.pqCodebooks(4, 8, 4)
    val vecGen = Gen.listOfN(16, Gen.choose(-2.0, 2.0))
    val codeGen = Gen.listOfN(4, Gen.choose(0, 7))
    samples(vecGen.flatMap(v => codeGen.map(c => (v, c))), 60)
      .foreach { case (vec, nibbles) =>
        val fd = ArrayData.toArrayData(vec.toArray)
        val enc = graft.functions.PqEncode.encode(fd, books).toLongArray()
        val lut = graft.functions.PqLut.build(fd, books)
        assert(graft.functions.PqLut.adc(lut, enc(0), 4, 8) == enc(1))
        val l = lut.toLongArray()
        (0 until 4).foreach { m =>
          val chosen = ((enc(0) >> (4 * m)) & 15L).toInt
          assert(l.slice(m * 8, m * 8 + 8).min == l(m * 8 + chosen))
        }
        // an arbitrary (possibly non-optimal) code can never beat the
        // encoder's own code — per-subspace minimality summed
        val rndCode = nibbles.zipWithIndex
          .map { case (c, m) => c.toLong << (4 * m) }.sum
        assert(graft.functions.PqLut.adc(lut, rndCode, 4, 8) >= enc(1))
      }
  }

  test("ppm wrap → parse round-trips construction for arbitrary doc bytes") {
    val s = spark
    import s.implicits._
    val strGen = for {
      n <- Gen.choose(1, 60)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar.map(_.toString),
        Gen.oneOf(" ", "#", "\n", "P", "6", "ü", "→", "🙂")))
    } yield cs.mkString
    val docs = samples(strGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = graft.ext.Multimodal.ppmWrap(docs)
      .select(org.apache.spark.sql.functions.col("media_id"),
        graft.functions.MediaCodecFunctions.ppmHeader(
          org.apache.spark.sql.functions.col("content")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byteLens = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length).toMap
    // every doc with >= 3 payload bytes wraps into a VALID container
    // whose parsed header matches the construction arithmetic — even
    // when the text contains 'P6', '#', newlines or multibyte chars
    val expected = byteLens.filter(_._2 >= 3)
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (id, len) =>
      val h = rows(id)
      val w = len / 3
      assert(h(0) == w && h(1) == 1L && h(2) == 255L && h(4) == 3L * w,
        s"doc $id: header $h for byte length $len")
      // data offset = 'P6\n# doc ' + id + '\n' + w + ' 1\n255\n'
      assert(h(3) == 17 + id.toString.length + w.toString.length)
    }
  }

  test("probe kernels ≡ sort-based reference on random vectors and partitions") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val dim = 6
    val caseGen = for {
      nCells <- Gen.choose(2, 24)
      cents <- Gen.listOfN(nCells, Gen.listOfN(dim, Gen.choose(-3.0, 3.0)))
      v <- Gen.listOfN(dim, Gen.choose(-3.0, 3.0))
      nProbe <- Gen.choose(1, 28) // may exceed nCells: clamp path
      nCoarse <- Gen.choose(1, 6)
    } yield (cents.map(_.toArray).toArray, v.toArray, nProbe, nCoarse)
    samples(caseGen, 60).foreach { case (cents, v, nProbe, nCoarse) =>
      val fd = ArrayData.toArrayData(v)
      def d2(c: Array[Double]): Double =
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      // reference: full sort by (distance, cell), take nProbe
      val ref = cents.indices.sortBy(c => (d2(cents(c)), c))
        .take(math.min(nProbe, cents.length))
      val got = graft.functions.VectorIndex.topCells(fd, cents, nProbe)
        .toIntArray().toSeq
      assert(got == ref, s"flat probe mismatch: $got vs $ref")
      // rank-1 prefix IS the assignment kernel
      assert(got.head == graft.functions.VectorIndex.nearestCell(fd, cents))
      // two-level at full probe == flat, for an arbitrary deterministic
      // partition of cells into nCoarse groups (round-robin)
      val k = math.min(nCoarse, cents.length)
      val members = Array.tabulate(k)(j =>
        cents.indices.filter(_ % k == j).toArray)
      val coarse = Array.tabulate(k)(j => cents(members(j).head))
      val two = graft.functions.TwoLevelIndex.topCellsTwoLevel(
        fd, coarse, members, cents, wProbe = k, nProbe = nProbe)
        .toIntArray().toSeq
      assert(two == ref, s"two-level full probe mismatch: $two vs $ref")
      assert(graft.functions.TwoLevelIndex.nearestCellTwoLevel(
        fd, coarse, members, cents, k) == ref.head)
    }
  }

  test("signed_project guard accepts exactly the int64-representable norms") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // single input dim, k=2 outputs with signs (+1, -1): out = (x, -x),
    // Σout² = 2x² — representable iff |x| ≤ √(2^63/2). Scan magnitudes
    // around the boundary and check accept/reject matches the predicate.
    val signs = Array(Array(1L, -1L))
    val limit = math.sqrt(Long.MaxValue.toDouble / 2)
    samples(Gen.choose(0.90, 1.10), 40).foreach { f =>
      val x = (limit * f).toLong
      val fits = // exact predicate, overflow-checked
        try { Math.addExact(Math.multiplyExact(x, x), Math.multiplyExact(x, x)); true }
        catch { case _: ArithmeticException => false }
      val accepted =
        try {
          graft.functions.SignedProject.project(
            ArrayData.toArrayData(Array(x)), signs); true
        } catch { case _: ArithmeticException => false }
      assert(accepted == fits, s"x=$x: accepted=$accepted, fits=$fits")
    }
  }

  test("sign_lsh_sigs ≡ project-then-pack reference for arbitrary vectors and sign matrices") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // reference: plain-Scala projection + bit pack, independently coded
    def ref(v: Array[Long], signs: Array[Array[Long]], bits: Int): Seq[Long] = {
      val k = signs(0).length
      val proj = Array.fill(k)(0L)
      for (i <- v.indices; j <- 0 until k) proj(j) += v(i) * signs(i)(j)
      proj.grouped(bits).map(_.zipWithIndex
        .map { case (p, j) => if (p >= 0) 1L << j else 0L }.sum).toSeq
    }
    val caseGen = for {
      dims <- Gen.choose(1, 6)
      bits <- Gen.choose(1, 4)
      tables <- Gen.choose(1, 4)
      v <- Gen.listOfN(dims, Gen.choose(-1000000L, 1000000L))
      signs <- Gen.listOfN(dims,
        Gen.listOfN(bits * tables, Gen.oneOf(1L, -1L)))
    } yield (v.toArray, signs.map(_.toArray).toArray, bits)
    samples(caseGen, 80).foreach { case (v, signs, bits) =>
      val got = graft.functions.SignLshSignatures.signatures(
        ArrayData.toArrayData(v), signs, bits).toLongArray().toSeq
      val want = ref(v, signs, bits)
      assert(got == want, s"v=${v.toSeq} bits=$bits: $got vs $want")
      // sign-scale invariance: doubling the vector never changes any
      // signature (only projection SIGNS are consumed)
      val scaled = graft.functions.SignLshSignatures.signatures(
        ArrayData.toArrayData(v.map(_ * 2L)), signs, bits)
        .toLongArray().toSeq
      assert(scaled == want, s"scale variance at v=${v.toSeq}")
    }
  }
}
