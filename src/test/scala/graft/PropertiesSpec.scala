package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.VectorFunctions
import graft.plans.{CosineSimilarity, SimHash32, SortedIntersectCount}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** Property-based checks (ScalaCheck) for the pieces with algebraic
  * contracts: the native kernels against their reference semantics, and
  * the tokenizer invariants SURVEY §5 calls for. Kernel properties are
  * exercised through interpreted eval (fast, no Spark jobs per case) —
  * ExpressionsSpec already pins eval == codegen. */
class PropertiesSpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the suite on any counterexample
    * (no scalatest-plus bridge in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(ga, gb) { (a, b) => f(a, b); true })

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(ga) { a => f(a); true })


  private def cosEval(a: Seq[Double], b: Seq[Double]): Double =
    CosineSimilarity(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType))).eval(null).asInstanceOf[Double]

  private val vecGen = Gen.listOfN(16, Gen.choose(-5.0, 5.0))
    .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine kernel: symmetric, bounded, and 1 on self") {
    forAll(vecGen, vecGen) { (a, b) =>
      val ab = cosEval(a, b); val ba = cosEval(b, a)
      assert(ab == ba, "symmetry must be exact (commutative products)")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(cosEval(a, a) - 1.0) < 1e-9)
    }
  }

  test("cosine kernel: scale-invariant in either argument") {
    forAll(vecGen, Gen.choose(0.1, 10.0)) { (a, k) =>
      val scaled = a.map(_ * k)
      assert(math.abs(cosEval(a, scaled) - 1.0) < 1e-9)
    }
  }

  private def interEval(a: Seq[String], b: Seq[String]): Int =
    SortedIntersectCount(
      Literal.create(a, ArrayType(StringType)),
      Literal.create(b, ArrayType(StringType))).eval(null).asInstanceOf[Int]

  private val setGen = Gen.listOf(Gen.alphaLowerStr.map(_.take(6)))
    .map(_.distinct.sorted)

  test("intersect kernel: equals scala Set intersection on sorted distinct input") {
    forAll(setGen, setGen) { (a, b) =>
      assert(interEval(a, b) == a.toSet.intersect(b.toSet).size)
    }
  }

  test("intersect kernel: bounds and identities") {
    forAll(setGen, setGen) { (a, b) =>
      val c = interEval(a, b)
      assert(c <= math.min(a.size, b.size))
      assert(interEval(a, a) == a.size)
      assert(interEval(a, Nil) == 0)
    }
  }

  private def simhashEval(hs: Seq[Long]): Long =
    SimHash32(Literal.create(hs, ArrayType(LongType))).eval(null).asInstanceOf[Long]

  private val hashGen = Gen.listOf(Gen.choose(0L, (1L << 32) - 1))

  test("simhash kernel: matches an independent vote recomputation, fits in 32 bits") {
    forAll(hashGen) { hs =>
      val fp = simhashEval(hs)
      assert((fp >>> 32) == 0L)
      val expected = (0 until 32).foldLeft(0L) { (acc, j) =>
        val set = hs.count(h => ((h >>> j) & 1L) == 1L)
        if (2 * set - hs.size > 0) acc | (1L << j) else acc
      }
      assert(fp == expected)
    }
  }

  test("simhash kernel: permutation-invariant (bag semantics)") {
    forAll(hashGen) { hs =>
      assert(simhashEval(hs) == simhashEval(hs.reverse))
    }
  }

  private def shingleEval(tokens: Seq[String], w: Int): Seq[(String, Int)] =
    graft.plans.ShinglePosting(
        Literal.create(tokens, ArrayType(StringType)), Literal(w))
      .eval(null).iterator.toSeq
      .map(r => (r.getUTF8String(0).toString, r.getInt(1)))

  private val toksGen: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee", "")))

  test("shingle_posting generator: matches an independent recomputation on random inputs") {
    forAll(toksGen, Gen.choose(1, 4)) { (toks, w) =>
      // reference semantics: distinct w-windows, first-occurrence order,
      // distinct count on every row
      val want = toks.sliding(w).filter(_.size == w)
        .map(_.mkString(" ")).toSeq.distinct
      val got = shingleEval(toks, w)
      assert(got.map(_._1) == want, s"toks=$toks w=$w")
      assert(got.forall(_._2 == want.size))
    }
  }
}
